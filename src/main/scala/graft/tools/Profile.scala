package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: split one key's wall time into DataFrame construction +
  * analysis, optimize+physical-planning, and execution, per iteration.
  * The split tells a regression hunt whether time went to Catalyst (rule
  * count grows with the inventory) or to the executed stages (data/layout).
  *
  * Usage: runMain graft.tools.Profile <key> [iters] [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val iters = if (args.length > 1) args(1).toInt else 6
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to iters).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(key)(spark, sfDir)
      df.queryExecution.analyzed // force analysis
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // optimize + plan
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"[profile] $key iter $i: analyze ${(t1 - t0) / 1e9}%.3f  " +
        f"plan ${(t2 - t1) / 1e9}%.3f  exec ${(t3 - t2) / 1e9}%.3f  " +
        f"total ${(t3 - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
