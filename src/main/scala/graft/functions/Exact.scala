package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic numeric helpers.
  *
  * Double addition is not associative, so `SUM(double)` differs in the last
  * ULPs between Spark (partial/final hash agg over 32 partitions) and any
  * other engine (the driver's DuckDB oracle) — and between two runs of the
  * SAME engine with different partitioning. At 100 TB that nondeterminism is
  * also an operational hazard (re-run ≠ same answer). The fix used across
  * every aggregate in this library: sum in exact decimal arithmetic, cast the
  * final value to double. Input columns here carry at most 2 decimal digits
  * (money, measures), so `DECIMAL(18,2)` is lossless; sums stay within
  * Spark's `DECIMAL(38,_)` for far beyond the 100 TB row counts involved
  * (1e16 rows of 1e4-magnitude values).
  */
object Exact {
  /** Lossless decimal view of a ≤2-decimal-digit double measure. */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Lossless decimal view of a ≤4-decimal-digit double (discount/tax). */
  def frac(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Exact sum of a ≤2-decimal double, returned as a deterministic double. */
  def sumMoney(c: Column): Column = sum(money(c)).cast("double")

  /** Exact mean of a ≤2-decimal double: decimal sum / count, in doubles.
    * Both engines compute the identical decimal sum, the identical count,
    * and one IEEE division — bitwise-equal results. */
  def avgMoney(c: Column): Column =
    sum(money(c)).cast("double") / count(c)

  /** TPC-H style revenue term `x * (1 - d)`, exact in decimal. */
  def revenueTerm(price: Column, discount: Column): Column =
    money(price) * (lit(BigDecimal(1)) - frac(discount))

  def sumRevenue(price: Column, discount: Column): Column =
    sum(revenueTerm(price, discount)).cast("double")
}
