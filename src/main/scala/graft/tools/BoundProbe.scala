package graft
package tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe sizing the invariant-oracle bounds (round 11): measures the
  * actual sketch/ANN errors per scale so each bound is set from data
  * (min observed margin with slack), not guessed.
  *
  * Usage: runMain graft.tools.BoundProbe <sfDir> [sfDir...]
  */
object BoundProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.Tables

    args.foreach { dir =>
      println(s"===== $dir =====")
      // 1. HLL per-group relative error
      val hll = Tables.events(spark, dir).groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("a"),
          countDistinct(col("user_id")).as("e"))
        .select(max(abs(col("a") - col("e")) / col("e")).as("maxrel"))
        .head().getDouble(0)
      println(f"hll_group_maxrel $hll%.5f")
      // 2. HLL union error
      val u = Tables.events(spark, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("a"))
        .crossJoin(Tables.events(spark, dir)
          .agg(countDistinct(col("user_id")).as("e")))
        .select(abs(col("a") - col("e")) / col("e")).head().getDouble(0)
      println(f"hll_union_rel $u%.5f")
      // 3. approx_percentile rank bracket margins (worst across groups/qs)
      val ap = Tables.lineitem(spark, dir).groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_quantity, 0.5, 10000)").as("q50"),
          expr("approx_percentile(l_quantity, 0.9, 10000)").as("q90"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50"))
      val br = Tables.lineitem(spark, dir)
        .join(broadcast(ap), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_quantity") < col("q50"), 1).otherwise(0)).as("lt50"),
          sum(when(col("l_quantity") <= col("q50"), 1).otherwise(0)).as("le50"),
          sum(when(col("l_quantity") < col("q90"), 1).otherwise(0)).as("lt90"),
          sum(when(col("l_quantity") <= col("q90"), 1).otherwise(0)).as("le90"),
          sum(when(col("l_extendedprice") < col("p50"), 1).otherwise(0)).as("ltp"),
          sum(when(col("l_extendedprice") <= col("p50"), 1).otherwise(0)).as("lep"))
        .select(
          max(greatest(
            col("lt50").cast("double") / col("n") - 0.5,
            lit(0.5) - col("le50").cast("double") / col("n"))).as("m50"),
          max(greatest(
            col("lt90").cast("double") / col("n") - 0.9,
            lit(0.9) - col("le90").cast("double") / col("n"))).as("m90"),
          max(greatest(
            col("ltp").cast("double") / col("n") - 0.5,
            lit(0.5) - col("lep").cast("double") / col("n"))).as("mp"))
        .head()
      println(f"approx_pct_rank_margin q50=${br.getDouble(0)}%.6f " +
        f"q90=${br.getDouble(1)}%.6f p50=${br.getDouble(2)}%.6f")
      // 4. DDSketch merged-store value error vs exact percentile
      locally {
        import graft.functions.{QuantileEstimate, QuantileMergeAgg, QuantileSketchAgg}
        val daily = Tables.events(spark, dir)
          .groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(QuantileSketchAgg(col("value"), 0.01).as("sk"))
        val est = daily.groupBy(col("event_type"))
          .agg(QuantileMergeAgg(col("sk")).as("msk"))
          .select(col("event_type"),
            QuantileEstimate(col("msk"), 0.5).as("e50"),
            QuantileEstimate(col("msk"), 0.9).as("e90"))
        val ex = Tables.events(spark, dir).groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.5)").as("x50"),
            expr("percentile(value, 0.9)").as("x90"),
            min(col("value")).as("vmin"), max(col("value")).as("vmax"))
        val j = est.join(ex, "event_type")
          .select(
            max(abs(col("e50") - col("x50")) /
              greatest(abs(col("x50")), lit(1e-9))).as("r50"),
            max(abs(col("e90") - col("x90")) /
              greatest(abs(col("x90")), lit(1e-9))).as("r90"),
            min(col("vmin")).as("vmin"), max(col("vmax")).as("vmax"))
          .head()
        println(f"ddsketch_rel r50=${j.getDouble(0)}%.6f " +
          f"r90=${j.getDouble(1)}%.6f vrange=[${j.getDouble(2)}%.3f," +
          f"${j.getDouble(3)}%.3f]")
      }
      // 5. sim_search family recall@10 vs brute force
      val brute = graft.operators.SimilarityOps.simSearch(spark, dir)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      def recall(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val ids = df.select("vec_id").collect().map(_.getLong(0))
        println(s"recall $name n=${ids.length} " +
          s"r=${ids.toSet.intersect(brute).size}/10")
      }
      recall("ivf", graft.ml.IvfIndex.simSearchIvf(spark, dir))
      recall("ivf_serve", graft.ml.IvfIndex.simSearchIvfServe(spark, dir))
      recall("pq", graft.ml.PqIndex.simSearchPq(spark, dir))
      recall("pq_serve", graft.ml.PqIndex.simSearchPqServe(spark, dir))
      recall("ivfpq", graft.ml.PqIndex.simSearchIvfPq(spark, dir))
      recall("ivfpq_serve", graft.ml.PqIndex.simSearchIvfPqServe(spark, dir))
    }
    spark.stop()
  }
}
