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
}
