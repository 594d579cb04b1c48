package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Custom aggregate (TypedImperativeAggregate — the buffer-based tier of
  * the custom-function ladder): SimHash fingerprint of a group of 31-bit
  * hashes.
  *
  * Buffer = 32 signed bit-counters; update adds ±1 per bit of each input
  * hash; merge adds counters elementwise (associative + commutative, so
  * partial aggregation applies — the map-side combine is what makes this
  * one-pass at 100 TB); eval packs sign bits into the fingerprint long.
  *
  * Replaces the 32-separate-`sum(CASE ...)` formulation: one aggregate
  * expression instead of 32, one buffer write per input instead of 32
  * column updates, and far less generated code to JIT. Produces the
  * IDENTICAL fingerprint (same counters, same sign rule), so the DuckDB
  * oracle is untouched.
  */
case class SimhashAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  // SQL-registered: a non-long column must fail analysis, not throw a
  // ClassCastException on an executor mid-job
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires a BIGINT column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](32)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 32) {
        buf(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 32) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var fp = 0L
    var b = 0
    while (b < 32) {
      if (buf(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(32 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(32)(bb.getInt())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_simhash"

  override def withNewMutableAggBufferOffset(off: Int): SimhashAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): SimhashAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimhashAgg =
    copy(child = newChildren.head)
}

object SimhashAgg {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column-API entry point: `simhash(hashCol)` aggregate. */
  def apply(c: Column): Column =
    GraftSqlBridge.column(
      SimhashAgg(GraftSqlBridge.expression(c)).toAggregateExpression())
}
