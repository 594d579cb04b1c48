package graft.operators

import org.apache.spark.sql.DataFrame

/** Eagerly materialize a frame that MULTIPLE downstream branches of one
  * action consume.
  *
  * `.cache()` alone is the wrong tool for intra-action sharing, for two
  * reasons this repo has now measured:
  *
  *  1. **Cold-cache race.** A cached-but-unmaterialized partition is
  *     computed independently by every concurrent stage that needs it —
  *     the block manager dedups only AFTER one writer finishes. Three
  *     branches fanning out from one shared frame inside a single action
  *     can each recompute the whole subplan.
  *  2. **Eviction fragility.** A long multi-tenant session (the driver's
  *     full 455-key bench refresh) can evict the entry between branches:
  *     round 8's `dedup_pipeline` ran at 5.05 s on an idle box and 32.6 s
  *     (6.5×) under the driver's refresh for exactly this reason — the
  *     plan was right, its cost depended on cache residency.
  *
  * `localCheckpoint(eager = true)` runs the subplan ONCE, NOW, pins the
  * result MEMORY_AND_DISK (spills to disk under pressure instead of
  * silently degrading into a recompute) and truncates lineage, so every
  * consumer — concurrent or not, early or late in the session — reads the
  * same materialized blocks. The blocks are GC-managed via the
  * ContextCleaner: repeated invocations don't accumulate session-lifetime
  * cache entries the way un-unpersisted `cache()` does.
  *
  * Cluster trade-off: a local checkpoint is not fault-tolerant — executor
  * loss costs a stage re-run. That is the standard iterative-Spark trade
  * (the BFS/label-propagation loops in [[MiningOps]]/[[AnalyticsOps]]
  * already make it); for a composite measured in seconds it is strictly
  * better than a recompute the scheduler performs silently per branch.
  */
private[graft] object Eager {

  /** Pre-checkpoint OPTIMIZED plans keyed by checkpointed-RDD id — the
    * auditability hook: plan-shape specs look THROUGH a checkpointed
    * leaf (is the frame group-sized? fact-sized?) the way they look
    * through `InMemoryRelation.cachedPlan`. Bounded defensively; entries
    * are driver-side plan trees, a few KB each. */
  private[graft] val provenance =
    new java.util.concurrent.ConcurrentHashMap[
      Int, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]()
  private val ProvenanceMax = 8192

  def apply(df: DataFrame): DataFrame = {
    val pre = df.queryExecution.optimizedPlan
    // strip originConstraints from the checkpoint leaf: they carry
    // pre-checkpoint exprIds and break Union constraint rewriting when
    // the frame is self-unioned (see GraftSqlBridge for the full story);
    // the pre-checkpoint plan's stats are re-attached so size-based
    // broadcast decisions over the checkpointed frame stay intact
    val (clean, rddId) = org.apache.spark.sql.GraftSqlBridge
      .stripCheckpointConstraints(df.localCheckpoint(true),
        Some(pre.stats))
    rddId.foreach { id =>
      if (provenance.size() >= ProvenanceMax) provenance.clear()
      provenance.put(id, pre)
    }
    clean
  }

  /** The plan a checkpointed leaf materialized, if `p` is one. */
  private[graft] def planBehind(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] =
    org.apache.spark.sql.GraftSqlBridge.checkpointRddId(p)
      .flatMap(id => Option(provenance.get(id)))

  /** The plan behind a physical `RDDScanExec`, if checkpoint-backed. */
  private[graft] def planBehindPhys(
      p: org.apache.spark.sql.execution.SparkPlan)
      : Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] =
    org.apache.spark.sql.GraftSqlBridge.checkpointRddIdPhys(p)
      .flatMap(id => Option(provenance.get(id)))
}
