package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** graft_dot registered via SparkSessionExtensions is callable from SQL.
  * Own session (not SparkSuite's): extensions bind at builder time. */
class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // getOrCreate would return another suite's session and silently skip
    // the extensions; clear the handles so the builder makes a fresh
    // session (reusing the JVM's single SparkContext is fine)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  test("SELECT graft_dot(...) works like a built-in") {
    val got = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(got === 32.0)
  }

  test("graft_cosine composes from the native dot product") {
    val got = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c," +
        " graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS o")
      .collect().head
    assert(math.abs(got.getDouble(0) - 1.0) < 1e-12)
    assert(got.getDouble(1) === 0.0)
  }

  test("type errors surface at analysis, like any built-in") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_dot(array('x'), array('y'))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<double>"))
  }

  test("graft_simhash aggregates from SQL, grouped and global") {
    val got = spark.sql(
      """SELECT graft_simhash(h) AS fp FROM
        |  (VALUES (CAST(5 AS BIGINT)), (CAST(5 AS BIGINT)), (CAST(2 AS BIGINT))) t(h)"""
        .stripMargin).collect().head.getLong(0)
    // bits 0,2 appear twice/once among {101,101,010}: counters per bit =
    // [+1+1-1, -1-1+1, ...] → bit0 set (2-1>0), bit1 unset (1-2<0)
    assert((got & 1L) === 1L)
    assert((got >> 1 & 1L) === 0L)
  }

  test("graft_heavy_hitters aggregates from SQL with a literal capacity") {
    val rows = spark.sql(
      """SELECT hh.term, hh.cnt FROM (
        |  SELECT explode(graft_heavy_hitters(s, 8)) AS hh FROM
        |    (VALUES ('a'), ('a'), ('a'), ('b'), ('b'), ('c')) t(s))"""
        .stripMargin).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("SQL-registered aggregates type-check at analysis, not on executors") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_heavy_hitters(h, 8) FROM (VALUES (CAST(1 AS BIGINT))) t(h)")
        .collect()
    }
    assert(e1.getMessage.contains("STRING"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_simhash(s) FROM (VALUES ('x')) t(s)").collect()
    }
    assert(e2.getMessage.contains("BIGINT"))
  }

  test("graft_heavy_hitters rejects non-positive capacity and accepts TINYINT") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_heavy_hitters(s, 0) FROM (VALUES ('a')) t(s)")
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("positive"))
    val ok = spark.sql(
      "SELECT size(graft_heavy_hitters(s, CAST(8 AS TINYINT))) FROM (VALUES ('a')) t(s)")
      .collect().head.getInt(0)
    assert(ok === 1)
  }

  test("graft_heavy_hitters rejects a non-literal capacity at analysis") {
    val err = intercept[Exception] {
      spark.sql(
        "SELECT graft_heavy_hitters(s, length(s)) FROM (VALUES ('aa')) t(s)")
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }
}
