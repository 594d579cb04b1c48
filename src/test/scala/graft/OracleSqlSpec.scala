package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.OracleSql

/** Pins the shared graph-oracle CTE rewrite ([[OracleSql.matCtes]]):
  * the happy-path rewrite, its idempotence, and the two guard rails the
  * advisor flagged (a RECURSIVE head must not be rewritten to the
  * DuckDB-invalid `AS MATERIALIZED`, and a named-WINDOW continuation
  * line must not be mistaken for a CTE head). */
class OracleSqlSpec extends AnyFunSuite {

  test("matCtes materializes the WITH head and every continuation CTE") {
    val sql =
      """WITH d0 AS (
        |  SELECT 1 AS x),
        |d1 AS (
        |  SELECT x + 1 AS x FROM d0 UNION ALL SELECT x FROM d0)
        |SELECT max(x) AS m FROM d1""".stripMargin
    val out = OracleSql.matCtes(sql)
    assert(out.contains("WITH d0 AS MATERIALIZED ("))
    assert(out.contains("d1 AS MATERIALIZED ("))
    // column aliases / non-CTE AS uses untouched
    assert(out.contains("AS x FROM d0"))
  }

  test("matCtes is idempotent") {
    val sql = "WITH a AS (\nSELECT 1 AS x)\nSELECT x FROM a"
    val once = OracleSql.matCtes(sql)
    assert(OracleSql.matCtes(once) == once)
  }

  test("matCtes rejects WITH RECURSIVE instead of corrupting it") {
    val sql =
      """WITH RECURSIVE r AS (
        |  SELECT 1 AS x UNION ALL SELECT x + 1 FROM r WHERE x < 3)
        |SELECT max(x) FROM r""".stripMargin
    val e = intercept[IllegalArgumentException](OracleSql.matCtes(sql))
    assert(e.getMessage.contains("RECURSIVE"))
  }

  test("matCtesSkip materializes non-recursive CTEs, leaves skipped heads") {
    val sql =
      """WITH RECURSIVE sh AS (
        |  SELECT 1 AS x),
        |reach(origin, node) AS (
        |  SELECT x, x FROM sh
        |  UNION
        |  SELECT r.origin, r.node + 1 FROM reach r WHERE r.node < 3)
        |SELECT max(node) FROM reach""".stripMargin
    val out = OracleSql.matCtesSkip(sql, skip = Set("reach"))
    assert(out.contains("WITH RECURSIVE sh AS MATERIALIZED ("))
    // the recursive head must stay untouched — AS MATERIALIZED on it is
    // invalid DuckDB
    assert(out.contains("reach(origin, node) AS ("))
    assert(!out.contains("reach(origin, node) AS MATERIALIZED"))
    // idempotent
    assert(OracleSql.matCtesSkip(out, skip = Set("reach")) == out)
  }

  test("matCtes rejects a named-WINDOW clause instead of corrupting it") {
    // The continuation line `w2 AS (...)` is regex-indistinguishable
    // from a CTE head — matCtes must refuse, not emit `w2 AS
    // MATERIALIZED (...)` inside a WINDOW clause.
    val sql =
      """SELECT sum(x) OVER w1 AS s, avg(x) OVER w2 AS a FROM t
        |WINDOW w1 AS (ORDER BY x),
        |w2 AS (PARTITION BY k ORDER BY x)""".stripMargin
    val e = intercept[IllegalArgumentException](OracleSql.matCtes(sql))
    assert(e.getMessage.contains("WINDOW"))
  }
}
