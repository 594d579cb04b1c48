package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale proof for dedup_cluster's distributed connected-components
  * fallback: runs the SAME corpus through both paths — driver union-find
  * (the ≤2M-edge fast path) and distributed min-label propagation with
  * pointer jumping (cap forced to 0) — asserts the label assignments are
  * IDENTICAL, and reports edge count, rounds-to-fixpoint, and wall time
  * per path. `ExtensionOps2Spec` pins path equality at sf0.001 on every
  * test run; this main exists to run the check on the synthetic sf≈1
  * store (`graft.Inflate` output), where the fallback does real
  * multi-round work — results are recorded in BASELINE.md.
  *
  * Usage: `runMain graft.tools.CcProof <sfDir>`
  */
object CcProof {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(cap: Long): (Map[Long, Long], Double) = {
      val t0 = System.nanoTime()
      val got = graft.operators.DedupOps
        .dedupClusterWithCap(spark, dir, cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (got, (System.nanoTime() - t0) / 1e9)
    }

    val (unionFind, tUf) = run(Long.MaxValue)
    val (distributed, tDist) = run(0L)
    val rounds = graft.operators.DedupOps.lastCcRounds.get()
    require(distributed == unionFind,
      s"label sets diverge: ${distributed.size} vs ${unionFind.size} nodes, " +
        distributed.toSet.diff(unionFind.toSet).take(5))
    val nClusters = unionFind.values.toSet.size
    val nDups = unionFind.count { case (id, cl) => id != cl }
    println(f"[ccproof] dir=$dir docs=${unionFind.size} " +
      f"clusters=$nClusters non_singleton_members=$nDups " +
      f"rounds=$rounds t_union_find=$tUf%.1fs t_distributed=$tDist%.1fs " +
      "labels_identical=true")
    spark.stop()
  }
}
