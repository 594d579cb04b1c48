package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-hardened within-cell pair generation (the `join_skew_salted`
  * discipline applied to SELF-joins).
  *
  * Every bucketed candidate generator here (`dedup_embed`'s coarse cells,
  * MinHash LSH band buckets, `embed_knn_graph`'s kNN cells) pairs rows
  * WITHIN a cell via a self-join keyed on the cell id. That is the right
  * global shape — never all-pairs — but one hot cell of B rows still lands
  * on ONE task doing O(B²) work: a single boilerplate-heavy LSH band or a
  * dense embedding cluster stalls the whole stage at 100 TB.
  *
  * This helper splits each cell into `ceil(|cell|/cap)` hash-assigned
  * sub-blocks and generates each unordered pair exactly once via the
  * triangular block join: a row in sub-block g joins as the LEFT side of
  * blocks (g, h) for h ≥ g and as the RIGHT side of blocks (h, g) for
  * h ≤ g. Each (cell, g1, g2) bucket holds ≤ ~2·cap rows, so no task sees
  * more than ~cap² candidate pairs, and the replication factor per row is
  * nsub+1 — linear in the skew, paid only by cells that are actually hot
  * (cold cells keep nsub = 1 and degenerate to the plain self-join).
  *
  * RECALL EFFECT: none. Unlike the stop-shingle / chunk-bucket caps (which
  * trade recall for a pair budget by DROPPING degenerate buckets), the
  * salted triangle is exhaustive — the output pair set is bit-identical to
  * the unsalted `a.cell = b.cell AND a.id < b.id` self-join, which is why
  * the oracle-checked keys can adopt it without a semantic waiver. The cap
  * only dials task granularity.
  */
object SkewPairs {

  /** Default sub-block row cap: ~1k rows → ≤ ~1M pairs per task, a few
    * seconds of dot products or Jaccard verifies — comfortably inside an
    * executor-task budget while keeping replication negligible for cells
    * near the cap. */
  val DefaultCap = 1024

  /** Per-row sub-block assignment: cell count, nsub = ceil(count/cap), and
    * a deterministic hash sub-block g ∈ [0, nsub). Exposed for the skew
    * spec, which plants a giant cell and asserts the per-block bound. */
  private[graft] def assignments(df: DataFrame, cellCols: Seq[String],
      idCol: String, cap: Int): DataFrame = {
    val counts = df.groupBy(cellCols.map(col): _*).agg(count(lit(1)).as("_cn"))
    df.join(counts, cellCols)
      .withColumn("_nsub", ceil(col("_cn") / lit(cap)).cast("int"))
      .withColumn("_g", pmod(xxhash64(col(idCol)), col("_nsub")).cast("int"))
  }

  /** All unordered within-cell pairs of `df`, each exactly once, with the
    * full source row packed into struct columns `a` and `b` (canonicalized
    * so `a`'s id orders before `b`'s). Exact — see object doc. */
  def pairs(df: DataFrame, cellCols: Seq[String], idCol: String,
      cap: Int = DefaultCap): DataFrame = {
    val packed = assignments(df, cellCols, idCol, cap)
      .select(struct(cellCols.map(col): _*).as("_cell"),
        col("_nsub"), col("_g"),
        struct(df.columns.map(col): _*).as("_row"), col(idCol).as("_id"))
    val aSide = packed.select(col("_cell"), col("_g").as("_g1"),
      explode(sequence(col("_g"), col("_nsub") - 1)).as("_g2"),
      col("_row").as("a"), col("_id").as("_ida"))
    val bSide = packed.select(col("_cell"),
      explode(sequence(lit(0), col("_g"))).as("_g1"),
      col("_g").as("_g2"),
      col("_row").as("b"), col("_id").as("_idb"))
    // cross-block buckets (g1 ≠ g2) already hold each pair exactly once
    // (one row qualifies only as left, the other only as right), so the id
    // filter applies only to the diagonal, where both rows sit on both
    // sides; the output is then canonicalized to a.id < b.id because
    // cross-block role assignment is hash order, not id order.
    aSide.join(bSide, Seq("_cell", "_g1", "_g2"))
      .filter(col("_g1") =!= col("_g2") || col("_ida") < col("_idb"))
      .select(
        when(col("_ida") < col("_idb"), col("a")).otherwise(col("b")).as("a"),
        when(col("_ida") < col("_idb"), col("b")).otherwise(col("a")).as("b"))
  }
}
