package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.DedupOps.dot

/** IVF (inverted-file) index over an embedding column: a deterministic
  * mini k-means trains the coarse quantizer, vectors are assigned to their
  * nearest centroid cell, and a probe searches only its `nprobe` nearest
  * cells — the real version of what `sim_search_ann` approximates with the
  * pre-labeled `label` column.
  *
  * Scale shape: training touches each vector once per Lloyd iteration
  * (distributed argmin + per-dimension mean — two shuffles bounded by k·dim,
  * not by corpus size); the trained model is k·dim doubles, collected to the
  * driver and re-broadcast exactly like any ML model parameter (this is the
  * one sanctioned use of collect: model state, not data). At serving time
  * the table is written partitioned by `cell`, so an nprobe search reads
  * nprobe/k of the corpus.
  *
  * Determinism: init centroids are the k lowest vec_ids, iteration count is
  * fixed, and argmin ties break on the lower cell id — same result on every
  * run and partitioning (all reductions are min/argmin or exact means of
  * the same value sets).
  */
object IvfIndex {

  final case class Model(centroids: Array[(Int, Array[Double])])

  private def vecs(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Squared L2 distance between a vector column and a centroid literal. */
  private def dist2(v: org.apache.spark.sql.Column, c: Array[Double]) = {
    val cLit = array(c.map(lit): _*)
    val diff = zip_with(v, cLit, (a, b) => a - b)
    dot(diff, diff)
  }

  /** Assign every vector to its nearest centroid (ties → lowest cell id). */
  private def assign(data: DataFrame, model: Model): DataFrame = {
    val scored = model.centroids.map { case (cid, cvec) =>
      struct(dist2(col("v"), cvec).as("d"), lit(cid).as("cell"))
    }
    // array_min over structs orders by (d, cell) — deterministic argmin
    data.withColumn("best", array_min(array(scored: _*)))
      .withColumn("cell", col("best.cell"))
      .withColumn("d2", col("best.d"))
      .drop("best")
  }

  /** Train k cells with `iters` Lloyd iterations (fixed, deterministic). */
  def train(embeddings: DataFrame, k: Int, iters: Int): Model = {
    val data = vecs(embeddings).cache()
    // deterministic init: the k lowest vec_ids
    var model = Model(
      data.orderBy("vec_id").limit(k).collect().zipWithIndex.map {
        case (r, i) => i -> r.getSeq[Double](1).toArray
      })
    for (_ <- 1 to iters) {
      val assigned = assign(data, model)
      // new centroid = per-dimension mean of the assigned vectors;
      // k·dim rows come back — model-sized, not data-sized
      val means = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim")).agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("s"))
        .select(col("cell"), expr("transform(s, p -> p.m)").as("cvec"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      // empty cells keep their previous centroid
      val kept = model.centroids.toMap ++ means.toMap
      model = Model(kept.toArray.sortBy(_._1))
    }
    model
  }

  /** Total within-cluster squared distance (training objective). */
  def inertia(embeddings: DataFrame, model: Model): Double =
    assign(vecs(embeddings), model).agg(sum(col("d2"))).head().getDouble(0)

  /** Top-k cosine neighbours of `probeId`, searching only the `nprobe`
    * cells nearest to the probe vector. */
  def search(embeddings: DataFrame, model: Model, probeId: Long,
      k: Int, nprobe: Int): DataFrame = {
    val data = assign(vecs(embeddings), model)
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
    val probe = data.filter(col("vec_id") === probeId)
      .select(col("v").as("p_v"), col("norm").as("p_norm"))
    val probeRow = probe.head()
    val pVec = probeRow.getSeq[Double](0).toArray
    val cells = model.centroids
      .map { case (cid, cvec) =>
        var d = 0.0
        var i = 0
        while (i < pVec.length) {
          val t = pVec(i) - cvec(i); d += t * t; i += 1
        }
        cid -> d
      }
      .sortBy { case (cid, d) => (d, cid) }.take(nprobe).map(_._1)
    data.filter(col("cell").isin(cells.map(Integer.valueOf): _*) &&
        col("vec_id") =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), col("cell"),
        round(dot(col("v"), col("p_v")) / (col("norm") * col("p_norm")), 6)
          .as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_id"))
      .limit(k)
  }

  /** Driver-contract query: train 16 cells × 3 iterations on the table
    * itself, search 10 neighbours of vec 0 with nprobe=2. Rows-only key
    * (k-means means are FP-order-sensitive — no cross-engine oracle);
    * invariants pinned in IvfIndexSpec. */
  def simSearchIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val model = train(emb, k = 16, iters = 3)
    search(emb, model, probeId = 0L, k = 10, nprobe = 2)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_search_ivf" -> simSearchIvf _,
  )
}
