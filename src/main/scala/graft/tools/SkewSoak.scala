package graft
package tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-skew soak (round 11): the distributed paths the test SFs
  * never force, exercised on a purpose-built hostile store and verified
  * against their exact/small-path twins. Results go to BASELINE.md.
  *
  *  1. `dedup_cluster` large-graph path: a corpus whose near-dup pair
  *     graph EXCEEDS SmallGraphEdgeCap (2M directed edges), so
  *     `distributedMinLabel` (pointer-jumping min-label propagation) runs
  *     as the REAL path, not a cap=0 simulation — labels asserted
  *     identical to driver union-find, rounds + wall-times reported.
  *  2. `SkewPairs` under a genuinely hot cell: one embedding cell holds
  *     3 000 vectors (> DefaultCap = 1024 → the triangular sub-block
  *     split actually fires, nsub = 3), asserted to produce EXACTLY the
  *     unsalted self-join's pair set (the zero-recall-cost claim) while
  *     bounding per-task pair counts.
  *
  * Store shape (respects the production candidate caps — a hot cluster
  * must stay under ShingleDocFreqCap = 1000 or its shingles are
  * legitimately dropped and nothing pairs):
  *   documents: 1 hot cluster of 950 docs + 200 clusters of 95 + 10 000
  *   singletons → Σ pairs = C(950,2) + 200·C(95,2) ≈ 1.34M undirected
  *   (2.69M directed, 1.35× the 2M cap); within-cluster Jaccard ≈ 0.88.
  *   embeddings: 3 000 vectors in label 0 (hot cell), 200 × labels 1–9;
  *   every 10th vector duplicates its predecessor so cos-dup pairs exist.
  *
  * Usage: `runMain graft.tools.SkewSoak [storeDir]` (default /tmp/skew_soak)
  */
object SkewSoak {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/skew_soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    build(spark, dir)

    // ── 1. connected components: distributed path as the REAL path ──
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (dist, tDist) = time(graft.operators.DedupOps
      .dedupClusterWithCap(spark, dir, 2000000L) // the production cap
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val rounds = graft.operators.DedupOps.lastCcRounds.get()
    require(rounds > 0,
      s"distributed path did not run — pair graph under the cap?")
    val (uf, tUf) = time(graft.operators.DedupOps
      .dedupClusterWithCap(spark, dir, Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    require(dist == uf, s"labels diverge: ${dist.size} vs ${uf.size}")
    val clusters = uf.groupBy(_._2).values.map(_.size).filter(_ > 1)
    println(f"[soak-cc] docs=${uf.size} edges>cap distributed_rounds=$rounds " +
      f"t_distributed=$tDist%.1fs t_union_find=$tUf%.1fs " +
      f"non_singleton_clusters=${clusters.size} " +
      f"largest=${clusters.max} labels_identical=true")

    // ── 2. SkewPairs on the hot cell: split ≡ unsalted, timed ──
    import graft.operators.{DedupOps, SkewPairs}
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(DedupOps.dot(col("v"), col("v"))))
    def pairSet(df: DataFrame): (Long, Double) = {
      val (n, t) = time(df.count())
      (n, t)
    }
    val salted = SkewPairs.pairs(e, Seq("label"), "vec_id")
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
    val unsalted = e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
    val (nS, tS) = pairSet(salted)
    val (nU, tU) = pairSet(unsalted)
    require(nS == nU, s"salted pair count $nS != unsalted $nU")
    val diff = salted.exceptAll(unsalted).count() +
      unsalted.exceptAll(salted).count()
    require(diff == 0, s"salted/unsalted pair sets differ by $diff rows")
    val (nDedup, tDedup) = time(
      graft.operators.DedupOps.dedupEmbed(spark, dir).count())
    println(f"[soak-skew] hot_cell=3000 (nsub=3) pairs=$nS " +
      f"t_salted=$tS%.1fs t_unsalted=$tU%.1fs set_identical=true " +
      f"dedup_embed_pairs=$nDedup t_dedup_embed=$tDedup%.1fs")

    // ── 3. the hot LSH band end-to-end: minhash over the 950-doc hot
    // cluster (one band bucket of 950 docs — the skew the salt exists
    // for, just under the nsub threshold; granularity dial checked in 2)
    val (nMh, tMh) = time(
      graft.operators.DedupOps.dedupMinhash(spark, dir).count())
    println(f"[soak-minhash] pairs=$nMh t=$tMh%.1fs " +
      "(hot band: 950-doc bucket through SkewPairs)")
    spark.stop()
  }

  /** Deterministic hostile store — all generation is plan-side exprs
    * over spark.range (no driver loops). */
  private def build(spark: SparkSession, dir: String): Unit = {
    val f = new java.io.File(s"$dir/documents.parquet")
    if (f.exists()) return // content-stable: same generator, same store
    // documents: hot cluster ids 0..949 (cluster 0); 200×95 at ids
    // 1000..19999; singletons at ids 20000..29999. Σ pairs = C(950,2) +
    // 200·C(95,2) ≈ 1.34M undirected → 2.69M directed, 1.35× the 2M cap.
    // `div`, not Column./ — double division renders cid as "1.0526…"
    // making every doc's body unique (the first soak run found exactly
    // that: only the hot cluster paired).
    val clustered = spark.range(0, 20000)
      .filter(col("id") < 950 || col("id") >= 1000)
      .select(col("id").as("doc_id"),
        when(col("id") < 950, lit(0L))
          .otherwise(expr("(id - 1000) div 95 + 1")).as("cid"))
      .select(col("doc_id"),
        concat(
          expr("concat_ws(' ', transform(sequence(0, 29)," +
            " j -> concat('c', cid, 'w', j)))"),
          lit(" u"), col("doc_id"), lit(" v"), col("doc_id")).as("text"))
    val singles = spark.range(20000, 30000)
      .select(col("id").as("doc_id"),
        expr("concat_ws(' ', transform(sequence(0, 4)," +
          " j -> concat('s', id, 'x', j)))").as("text"))
    clustered.unionByName(singles)
      .select(col("doc_id"), col("text"), lit("xx").as("lang"),
        lit("soak").as("source"), length(col("text")).cast("long")
          .as("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // embeddings: 3000 in label 0, 200 × labels 1..9; every 10th vector
    // copies its predecessor (planted exact dups); components are
    // deterministic pseudo-randoms in [-1, 1), so unplanted cosines
    // concentrate near 0 and the ≥0.4 verify stays selective
    spark.range(0, 4800)
      .select(col("id").as("vec_id"),
        when(col("id") < 3000, 0)
          .otherwise(((col("id") - 3000L) / 200L + 1L).cast("int"))
          .as("label"),
        expr("transform(sequence(0, 63), d -> CAST(" +
          "(pmod((id - CASE WHEN id % 10 = 9 THEN 1 ELSE 0 END) * 2654435761" +
          " + d * 40503, 2001) - 1000) / 1000.0 AS FLOAT))").as("embedding"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }
}
