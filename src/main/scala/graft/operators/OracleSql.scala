package graft.operators

/** Shared oracle-SQL rewrite devices (DuckDB side only — never touches a
  * Spark plan). Hoisted here from verbatim twins in [[MiningOps]] and
  * [[AnalyticsOps]] so the two graph-oracle families cannot drift.
  */
private[graft] object OracleSql {

  /** Force every CTE in an iterative graph oracle to `AS MATERIALIZED`.
    *
    * Why: DuckDB INLINES multi-referenced CTEs, so an unrolled iterative
    * oracle whose round k references round k-1 twice re-expands the whole
    * prefix combinatorially — round 9 hit this on graph_kcore (>80 GB
    * spill at sf0.1) and fixed that one key by hand; the round-10 sf~1
    * gate showed the same blowup on graph_bfs (>95 CPU-min of DuckDB
    * work, vs seconds materialized) and the rest of the family is one
    * data decade behind it. `AS MATERIALIZED` is the SQL spelling of the
    * engine's own per-round localCheckpoint. Idempotent: an
    * already-materialized CTE no longer matches `AS (`.
    *
    * Guard rails (the rewrite is regex-shaped, so the inputs it is NOT
    * safe for are rejected rather than silently corrupted):
    *  - `WITH RECURSIVE` — `AS MATERIALIZED` is invalid on a recursive
    *    CTE head in DuckDB; every current graph oracle unrolls its rounds
    *    instead, so RECURSIVE input is a bug, not a case to handle.
    *  - a named-`WINDOW` clause — a line-leading continuation like
    *    `w2 AS (...)` is indistinguishable from a CTE head to the regex
    *    and would be corrupted into `w2 AS MATERIALIZED (...)`.
    */
  def matCtes(sql: String): String = {
    require(!sql.contains("RECURSIVE"),
      "matCtes: WITH RECURSIVE oracle — AS MATERIALIZED is invalid on a " +
        "recursive CTE head in DuckDB; unroll the rounds instead")
    require(!"""(?mi)^\s*WINDOW\b""".r.findFirstIn(sql).isDefined &&
      !"""(?i)\bWINDOW\s+[A-Za-z_0-9]+\s+AS\s*\(""".r
        .findFirstIn(sql).isDefined,
      "matCtes: named-WINDOW clause present — its continuation lines " +
        "would be rewritten as CTE heads; materialize by hand")
    sql.replaceAll("(?m)^(\\s*)([A-Za-z_0-9]+(\\([^)]*\\))?) AS \\(",
      "$1$2 AS MATERIALIZED (")
      // ... and the FIRST cte, which carries the WITH keyword on its line
      .replaceAll("(?m)^(WITH\\s+)([A-Za-z_0-9]+(\\([^)]*\\))?) AS \\(",
        "$1$2 AS MATERIALIZED (")
  }

  /** [[matCtes]] for a WITH-list that CONTAINS a genuinely recursive CTE:
    * materialize every CTE head EXCEPT the named ones (a recursive head
    * cannot take AS MATERIALIZED in DuckDB; its non-recursive siblings
    * can and must — the round-11 sf≈1 gate found the dedup-family
    * oracles' 4-5×-referenced shingle CTEs re-inlined into a multi-100 GB
    * spill, the same blowup class graph_bfs hit in round 10). The WINDOW
    * guard from [[matCtes]] applies; the RECURSIVE guard is replaced by
    * the explicit skip set. */
  def matCtesSkip(sql: String, skip: Set[String]): String = {
    require(!"""(?mi)^\s*WINDOW\b""".r.findFirstIn(sql).isDefined &&
      !"""(?i)\bWINDOW\s+[A-Za-z_0-9]+\s+AS\s*\(""".r
        .findFirstIn(sql).isDefined,
      "matCtesSkip: named-WINDOW clause present — its continuation lines " +
        "would be rewritten as CTE heads; materialize by hand")
    def keep(name: String): Boolean = skip.contains(name.takeWhile(_ != '('))
    val body = """(?m)^(\s*)([A-Za-z_0-9]+(\([^)]*\))?) AS \(""".r
      .replaceAllIn(sql, m =>
        if (keep(m.group(2))) scala.util.matching.Regex.quoteReplacement(m.matched)
        else scala.util.matching.Regex
          .quoteReplacement(s"${m.group(1)}${m.group(2)} AS MATERIALIZED ("))
    """(?m)^(WITH(?: RECURSIVE)?\s+)([A-Za-z_0-9]+(\([^)]*\))?) AS \(""".r
      .replaceAllIn(body, m =>
        if (keep(m.group(2))) scala.util.matching.Regex.quoteReplacement(m.matched)
        else scala.util.matching.Regex
          .quoteReplacement(s"${m.group(1)}${m.group(2)} AS MATERIALIZED ("))
  }
}
