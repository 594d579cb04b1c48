package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom aggregate: distinct values of a long column, capped.
  *
  * Returns the SORTED distinct values when the group has at most `cap`
  * of them, and NULL the moment it exceeds the cap — at which point the
  * buffer stops growing, so memory per group is O(cap) no matter how
  * pathological the group is. Update/merge are commutative + associative
  * (set union with saturation), so partial aggregation applies and the
  * map-side combine both dedups and saturates BEFORE the shuffle.
  *
  * Purpose-built for candidate generation in the dedup family: a shingle's
  * posting list is only useful when it is small (a shingle shared by more
  * than `cap` documents is a stop-shingle that would blow up candidate
  * pairing, SURVEY §2.10); this aggregate computes "posting list or
  * too-big" in ONE shuffle where the distinct + windowed-count formulation
  * needs two, and without ever materializing a hot shingle's full list —
  * the property that matters at 100 TB, where one boilerplate shingle can
  * occur in 10^8 documents.
  */
case class BoundedDistinctAgg(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashSet[Long]] {

  require(cap > 0, s"cap must be positive, got $cap")

  /** Saturated marker: one element past the cap; adds are no-ops beyond. */
  private def saturated(s: java.util.HashSet[Long]): Boolean = s.size > cap

  override def createAggregationBuffer(): java.util.HashSet[Long] =
    new java.util.HashSet[Long]()

  override def update(buf: java.util.HashSet[Long], input: InternalRow): java.util.HashSet[Long] = {
    if (!saturated(buf)) {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: java.util.HashSet[Long], b: java.util.HashSet[Long]): java.util.HashSet[Long] = {
    val it = b.iterator()
    while (it.hasNext && !saturated(a)) a.add(it.next())
    a
  }

  override def eval(buf: java.util.HashSet[Long]): Any =
    if (saturated(buf)) null
    else {
      val arr = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      java.util.Arrays.sort(arr)
      new GenericArrayData(arr)
    }

  override def serialize(buf: java.util.HashSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.HashSet[Long](Math.max(16, n * 2))
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_bounded_distinct"

  override def withNewMutableAggBufferOffset(off: Int): BoundedDistinctAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BoundedDistinctAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedDistinctAgg =
    copy(child = newChildren.head)
}

object BoundedDistinctAgg {
  import org.apache.spark.sql.GraftSqlBridge

  /** `bounded_distinct(col, cap)`: sorted distinct longs, or null past cap. */
  def apply(c: Column, cap: Int): Column =
    GraftSqlBridge.column(
      BoundedDistinctAgg(GraftSqlBridge.expression(c), cap).toAggregateExpression())
}
