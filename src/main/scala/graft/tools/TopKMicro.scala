package graft
package tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** sf≈1 micro for the native TopKPerKey operator vs the row_number
  * window form (verdict r10 task 8's missing number): same result set,
  * the native form's per-partition bounded heaps vs the window's
  * partition-wide sort. Usage: runMain graft.tools.TopKMicro [sfDir]. */
object TopKMicro {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1_r11")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"))
    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val w = Window.partitionBy(col("event_type"))
      .orderBy(desc("value"), col("event_id"))
    (1 to 3).foreach { i =>
      val (nN, tN) = time(graft.plans.TopK.perKey(ev, Seq(col("event_type")),
        Seq(desc("value"), col("event_id")), 5).count())
      val (nW, tW) = time(ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5).drop("rn").count())
      require(nN == nW, s"$nN != $nW")
      println(f"[topk-micro] iter $i rows=$nN native=$tN%.2fs window=$tW%.2fs")
    }
    // plan evidence at this scale: the rewrite fires on the idiom too
    val idiom = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
    graft.plans.TopK.enableRewrite(spark)
    idiom.collect()
    val plan = idiom.queryExecution.executedPlan.toString
    println(s"[topk-micro] rewrite fires at $dir: " +
      s"${plan.contains("FinalTopK")} (FinalTopK), no Sort: " +
      s"${!plan.contains("Sort")}")
    spark.stop()
  }
}
