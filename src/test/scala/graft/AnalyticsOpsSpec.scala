package graft

import org.apache.spark.sql.functions._
import graft.operators.AnalyticsOps

/** Invariants for the analytics family (cohort/funnel/anomaly/pagerank/
  * SCD2) beyond the DuckDB hash oracle: structural properties that must
  * hold at ANY scale factor, plus determinism under repartitioning for the
  * iterative fixed-point PageRank (the property the integer arithmetic
  * exists to guarantee).
  */
class AnalyticsOpsSpec extends SparkSuite {
  import spark.implicits._

  test("cohort_retention: offset-0 cell equals cohort size; users never exceed it") {
    val ret = AnalyticsOps.cohortRetention(spark, sf0001).collect()
    val day0 = ret.filter(_.getLong(1) == 0L)
      .map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    // every cohort has its day-0 row (the first-active day itself)
    val cohorts = ret.map(_.getDate(0).toString).distinct
    assert(cohorts.forall(day0.contains))
    // retention is bounded by the cohort's size at offset 0
    assert(ret.forall(r => r.getLong(2) <= day0(r.getDate(0).toString)))
  }

  test("funnel_steps: step counts are monotone non-increasing") {
    val steps = AnalyticsOps.funnelSteps(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(steps.size == 3)
    assert(steps("1_view") >= steps("2_view_click"))
    assert(steps("2_view_click") >= steps("3_view_click_purchase"))
    // sf0.001 has 15 users all active across a month — everyone converts
    assert(steps("1_view") > 0)
  }

  test("anomaly_mad: outliers are a strict minority and counts are consistent") {
    val rows = AnalyticsOps.anomalyMad(spark, sf0001).collect()
    assert(rows.length == 5) // one per event_type
    rows.foreach { r =>
      val (out, total) = (r.getLong(1), r.getLong(2))
      assert(out >= 0 && out <= total)
      // 3-sigma-equivalent robust threshold keeps outliers rare
      assert(out.toDouble / total < 0.2)
      assert(r.getDouble(4) >= 0) // MAD is non-negative
    }
  }

  test("attribution: both models conserve the purchase total, and the " +
    "untouched bucket is model-independent") {
    val rows = AnalyticsOps.attribution(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val models = rows.groupBy(_._1)
    assert(models.keySet === Set("first_touch", "last_touch"))
    val nPurch = graft.sources.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase").count()
    models.values.foreach { m =>
      assert(m.map(_._3).sum == nPurch) // every purchase credited once
      assert(m.forall(_._4 >= 0.0))
    }
    // total attributed value identical across models (same purchases)
    val va = models("first_touch").map(_._4).sum
    val vb = models("last_touch").map(_._4).sum
    assert(math.abs(va - vb) < 1e-6)
    // a purchase has a first touch iff it has a last touch
    def none(m: String) = rows.collectFirst {
      case (`m`, "(none)", n, _) => n }.getOrElse(0L)
    assert(none("first_touch") == none("last_touch"))
    // purchases never credit themselves
    assert(rows.forall(_._2 != "purchase"))
  }

  test("graph_label_prop: members conserve the node set, community ids are " +
    "node ids, and the synchronous rounds are repartition-invariant") {
    val a = AnalyticsOps.graphLabelProp(spark, sf0001).collect()
    val nodes = AnalyticsOps.graphPagerank(spark, sf0001)
      .select(col("node")).collect().map(_.getLong(0)).toSet
    // every node keeps exactly one label
    assert(a.map(_.getLong(1)).sum == nodes.size.toLong)
    // labels originate as node ids and only propagate — both the
    // community id and its min member must be real nodes
    assert(a.forall(r => nodes.contains(r.getLong(0))))
    assert(a.forall(r => nodes.contains(r.getLong(2))))
    // 3 rounds of mode-adoption on a connected trade graph must coarsen:
    // strictly fewer communities than nodes
    assert(a.length < nodes.size)
    // deterministic: the min(struct) tie-break ignores partitioning
    val b = {
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      try AnalyticsOps.graphLabelProp(spark, sf0001).collect()
      finally spark.conf.set("spark.sql.shuffle.partitions", old)
    }
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      b.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("graph_pagerank: bit-identical under repartitioning; mass bounded") {
    val a = AnalyticsOps.graphPagerank(spark, sf0001).collect()
    val b = {
      // force different parallelism → different partial-sum order; the
      // integer fixed-point must not care
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      try AnalyticsOps.graphPagerank(spark, sf0001).collect()
      finally spark.conf.set("spark.sql.shuffle.partitions", old)
    }
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // integer truncation only LOSES mass: total ≤ n·SCALE, and damping
    // keeps every rank ≥ 0.15·SCALE
    val n = a.length.toLong
    val total = a.map(_.getLong(1)).sum
    assert(total <= n * 1000000000000L)
    assert(a.forall(_.getLong(1) >= 150000000000L))
  }

  test("cdc_scd2: changed keys have v1 closed + v2 open; unchanged have one current row") {
    val scd = AnalyticsOps.cdcScd2(spark, sf0001).cache()
    val byKey = scd.groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n"), sum(when($"is_current", 1).otherwise(0)).as("cur"))
      .collect()
    byKey.foreach { r =>
      val changed = r.getLong(0) % 7 == 0
      assert(r.getLong(1) == (if (changed) 2L else 1L))
      assert(r.getLong(2) == 1L) // exactly one current version per key
    }
    // closed intervals end where the successor begins
    val bad = scd.filter($"version" === 1 && !$"is_current" &&
      datediff($"valid_to", $"valid_from") =!= 30).count()
    assert(bad == 0L)
    scd.unpersist()
  }

  test("rolling_active_users: WAU brackets DAU and the trailing-7-day " +
    "union, and matches a driver-side brute force") {
    val rows = AnalyticsOps.rollingActiveUsers(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val act = graft.sources.Tables.events(spark, sf0001)
      .select($"user_id", to_date($"ts").as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    rows.foreach { r =>
      val (day, dau, wau) =
        (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2))
      val expectDau = act.filter(_._2 == day).map(_._1).distinct.length
      val expectWau = act.filter { case (_, d) =>
        !d.isAfter(day) && !d.isBefore(day.minusDays(6))
      }.map(_._1).distinct.length
      assert(dau == expectDau, s"$day dau")
      assert(wau == expectWau, s"$day wau")
      assert(wau >= dau)
      assert(math.abs(r.getDouble(3) - dau.toDouble / wau) < 1e-6)
    }
  }
}
