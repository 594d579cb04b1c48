package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's public surface: one entry per operator key in SURVEY.md §2
  * (reference surface), §2.4/§2.6 (relational completions) and §2.10
  * (LLM-pipeline extensions). Each key has a matching DuckDB oracle in
  * [[oracleSql]] unless marked *(no oracle)* in SURVEY.md.
  */
object SparkEntry {
  /** Flagship query (SURVEY §7.2): revenue per region over the full
    * star-schema join. Driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    CoreOps.flagshipRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreOps.queries ++ RelationalOps.queries ++ TextOps.queries ++
      DedupOps.queries ++ SimilarityOps.queries ++ MultimodalOps.queries ++
      AdvancedOps.queries ++ SqlSurfaceOps.queries ++ AnalyticsOps.queries ++
      StatsOps.queries ++ MiningOps.queries ++
      graft.streaming.IngestPipeline.queries ++
      graft.streaming.StreamJoin.queries ++
      graft.streaming.StreamEwma.queries ++
      graft.ml.IvfIndex.queries ++ graft.ml.PqIndex.queries ++
      graft.ml.Pca.queries ++ graft.ml.LogReg.queries ++ graft.ml.Bpe.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreOps.oracles ++ RelationalOps.oracles ++ TextOps.oracles ++
      DedupOps.oracles ++ SimilarityOps.oracles ++ MultimodalOps.oracles ++
      AdvancedOps.oracles ++ SqlSurfaceOps.oracles ++ AnalyticsOps.oracles ++
      StatsOps.oracles ++ MiningOps.oracles ++
      graft.streaming.IngestPipeline.oracles ++
      graft.streaming.StreamJoin.oracles ++
      graft.streaming.StreamEwma.oracles ++
      graft.ml.IvfIndex.oracles ++ graft.ml.PqIndex.oracles
}
