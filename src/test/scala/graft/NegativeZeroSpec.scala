package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Round-3's only red row was a signed zero: DuckDB emitted `-0.0` for a
  * covariance that rounds to zero, Spark `+0.0` — every comparison
  * operator says equal, but the driver's bit-level hash (correctly)
  * disagrees. The fix is `round(...) + 0.0` on BOTH engines (IEEE 754:
  * `-0.0 + 0.0 = +0.0`). This spec pins the class of bug, not the
  * instance: no inventory key may emit a negative zero in any top-level
  * double/float column. Detection casts to string — `-0.0` keeps its sign
  * in Spark's formatting — so it needs no UDF and stays inside codegen
  * (IEEE `1/x` would also work but ANSI mode throws on the +0.0 rows).
  *
  * Runs at sf0.001 for suite speed; the sf0.01 surface is covered by the
  * bit-exact `tools/check_oracle.py` gate (floats compared as packed
  * little-endian bytes, mirroring the driver's hash discipline). */
class NegativeZeroSpec extends SparkSuite {

  test("no inventory key emits -0.0 in any double/float output column") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      val doubleCols = df.schema.fields.collect {
        case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
      }
      if (doubleCols.nonEmpty) {
        val negZeroCounts = doubleCols.map { c =>
          sum(when(col(c).cast("string") === "-0.0", 1)
            .otherwise(0)).as(c)
        }
        val counts = df.agg(negZeroCounts.head, negZeroCounts.tail: _*).head()
        doubleCols.zipWithIndex.foreach { case (c, i) =>
          val n = if (counts.isNullAt(i)) 0L else counts.getLong(i)
          assert(n == 0L, s"$name column '$c' contains $n negative zero(s)")
        }
      }
    }
  }
}
