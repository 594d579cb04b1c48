package graft

import org.apache.spark.sql.functions._
import graft.operators.CoreOps

/** Reference-semantics edge cases from SURVEY §2/§5: banker's rounding
  * parity with pandas, the "Lainnya" default for unmatched dimension keys,
  * empty-set guards, and pivot ≡ its unpivoted form. */
class ReferenceSemanticsSpec extends SparkSuite {
  import spark.implicits._

  test("bround is half-even, matching pandas round() (app.py:44, SURVEY C3)") {
    // pandas/numpy round: 0.5→0, 1.5→2, 2.5→2, 3.5→4 (banker's); Spark
    // round() would give 1,2,3,4 — the reference-faithful op is bround.
    val got = Seq(0.5, 1.5, 2.5, 3.5, -0.5, -2.5).toDF("x")
      .select(bround($"x").as("b")).as[Double].collect().toSeq
    assert(got === Seq(0.0, 2.0, 2.0, 4.0, -0.0, -2.0))
  }

  test("island lookup: unmatched city falls back to 'Lainnya' (app.py:25-29)") {
    // the reference's literal 16-city dim (app.py:15-23), abbreviated
    val dim = Seq(("Medan", "Sumatera"), ("Jakarta", "Jawa"),
      ("Ambon", "Maluku")).toDF("city", "pulau")
    val obs = Seq("Medan", "Jakarta", "Atlantis").toDF("city")
    val got = obs.join(broadcast(dim), Seq("city"), "left")
      .withColumn("pulau", coalesce($"pulau", lit("Lainnya")))
      .as[(String, String)].collect().toMap
    assert(got("Medan") === "Sumatera")
    assert(got("Atlantis") === "Lainnya")
  }

  test("empty-set guard (app.py:102,112) — isEmpty short-circuit") {
    val df = graft.sources.Tables.events(spark, sf0001)
      .filter($"event_type" === "no_such_type")
    assert(df.isEmpty)
  }

  test("empty island selection applies the time filter ONLY (app.py:107-110)") {
    // the reference branches: empty dropdown → time filter alone ("all
    // islands"); non-empty → time filter AND isin. An unconditional isin
    // over an empty list would wrongly return ZERO rows.
    val df = Seq(
      ("Jakarta", "Jawa", "2024-01-10 08:00:00"),
      ("Medan", "Sumatera", "2024-01-10 09:00:00"),
      ("Ambon", "Maluku", "2024-02-20 08:00:00"), // outside the range
    ).toDF("city", "pulau", "t").withColumn("ts", to_timestamp($"t"))
    def run(sel: Seq[String]): Seq[String] =
      CoreOps.selectionFilter(df, $"ts",
          lit("2024-01-01").cast("timestamp"), lit("2024-01-31").cast("timestamp"),
          $"pulau", sel)
        .select("city").as[String].collect().sorted.toSeq
    assert(run(Nil) === Seq("Jakarta", "Medan")) // time-only, NOT empty
    assert(run(Seq("Jawa")) === Seq("Jakarta"))
    assert(run(Seq("Jawa", "Sumatera")) === Seq("Jakarta", "Medan"))
  }

  test("missing local_time column falls back to now() (app.py:41-42)") {
    val withCol = Seq(("Jakarta", "2024-01-10 08:00:00"))
      .toDF("city", "local_time")
    val parsed = CoreOps.withTimestampFallback(withCol)
      .select($"timestamp".cast("string")).as[String].head()
    assert(parsed === "2024-01-10 08:00:00")
    // schema drift: no local_time column → wall-clock substitute, no crash
    val drifted = Seq("Jakarta").toDF("city")
    val now = CoreOps.withTimestampFallback(drifted)
      .select($"timestamp").as[java.sql.Timestamp].head()
    assert(math.abs(now.getTime - System.currentTimeMillis()) < 60000L)
  }

  test("pivot_matrix equals its unpivoted groupBy form (SURVEY A6)") {
    val pivoted = CoreOps.pivotMatrix(spark, sf0001)
    val unpivoted = graft.sources.Tables.events(spark, sf0001)
      .withColumn("user_bucket", $"user_id" % 10)
      .groupBy($"user_bucket", $"event_type")
      .agg(graft.functions.Exact.avgMoney($"value").as("avg_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val cols = Seq("click", "error", "purchase", "signup", "view")
    pivoted.collect().foreach { row =>
      val bucket = row.getLong(0)
      cols.zipWithIndex.foreach { case (c, i) =>
        val cell = if (row.isNullAt(i + 1)) None else Some(row.getDouble(i + 1))
        assert(cell === unpivoted.get((bucket, c)), s"bucket=$bucket col=$c")
      }
    }
  }

  test("summary stats use sample stddev, like pandas .std() (SURVEY A2)") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val (samp, pop) = df.agg(stddev_samp($"x"), stddev_pop($"x"))
      .as[(Double, Double)].head()
    // pandas: [1,2,3,4].std(ddof=1) = 1.2909944487358056
    assert(math.abs(samp - 1.2909944487358056) < 1e-12)
    assert(samp !== pop)
  }

  test("flagship revenue matches per-region independent recomputation") {
    val got = CoreOps.flagshipRevenue(spark, sf0001)
    assert(got.count() === 5)
    val total = got.agg(sum($"revenue")).as[Double].head()
    val direct = graft.sources.Tables.lineitem(spark, sf0001)
      .agg(graft.functions.Exact.sumRevenue($"l_extendedprice", $"l_discount"))
      .as[Double].head()
    // every lineitem joins through to exactly one region
    assert(math.abs(total - direct) < 1e-6)
  }
}
