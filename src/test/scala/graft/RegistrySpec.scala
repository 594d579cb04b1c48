package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Guards the SparkEntry registry merge: `Map ++` silently keeps the
  * LAST binding for a duplicated key, so a name collision between two
  * operator modules would shadow one implementation (and its oracle)
  * without any compile- or run-time signal. This spec makes that
  * failure loud. */
class RegistrySpec extends AnyFunSuite {

  private val modules: Seq[(String, Map[String, _])] = Seq(
    "CoreOps" -> CoreOps.queries,
    "RelationalOps" -> RelationalOps.queries,
    "TextOps" -> TextOps.queries,
    "DedupOps" -> DedupOps.queries,
    "SimilarityOps" -> SimilarityOps.queries,
    "MultimodalOps" -> MultimodalOps.queries,
    "AdvancedOps" -> AdvancedOps.queries,
    "SqlSurfaceOps" -> SqlSurfaceOps.queries,
    "AnalyticsOps" -> AnalyticsOps.queries,
    "StatsOps" -> StatsOps.queries,
    "MiningOps" -> MiningOps.queries,
    "IngestPipeline" -> graft.streaming.IngestPipeline.queries,
    "StreamJoin" -> graft.streaming.StreamJoin.queries,
    "StreamEwma" -> graft.streaming.StreamEwma.queries,
    "IvfIndex" -> graft.ml.IvfIndex.queries,
    "PqIndex" -> graft.ml.PqIndex.queries,
    "Pca" -> graft.ml.Pca.queries,
    "LogReg" -> graft.ml.LogReg.queries,
    "Bpe" -> graft.ml.Bpe.queries)

  test("no query key is defined by two modules (merge would shadow one)") {
    val all = modules.flatMap { case (m, q) => q.keys.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"duplicated keys: ${dups.map { case (k, ms) =>
        s"$k in ${ms.map(_._2).mkString("+")}" }.mkString(", ")}")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle belongs to a registered query key") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("key names are lower_snake (driver-safe, shell-safe)") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-snake keys: $bad")
  }
}
