package graft.functions

import org.apache.spark.sql.DataFrame

/** Distributed dense-rank dictionary: the distinct values of one string
  * column, sorted ascending, assigned contiguous 1-based ids.
  *
  * Semantically identical to `dense_rank() OVER (ORDER BY c)` over the
  * duplicate-free vocabulary, but computed as a distributed sort +
  * `zipWithIndex` (per-partition counts, then contiguous ids) instead of a
  * partitionless window that would funnel the whole vocabulary through ONE
  * task — the classic scale cliff. The result is vocabulary-sized and
  * broadcastable.
  *
  * Shared by the dedup family's shingle dictionary and text
  * fingerprinting's token dictionary: both exist only because a hash seed
  * (xxhash64) can't be replicated bit-for-bit in the DuckDB oracle; the
  * `_fast` twins skip the dictionary entirely. One implementation keeps the
  * ordering-preservation and 1-based-id contract — which those oracles
  * depend on — in one place.
  */
object RankDict {

  /** Dictionary over `df`'s string column `c`: two columns `(c, idCol)`,
    * ids 1..|vocabulary| in ascending `c` order. */
  def ranked(df: DataFrame, c: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(c).distinct().orderBy(c)
      .as[String].rdd.zipWithIndex()
      .map { case (v, i) => (v, i + 1) }
      .toDF(c, idCol)
  }
}
