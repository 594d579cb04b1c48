package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.util.hashing.MurmurHash3
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Count-Min sketch over string keys — the point-frequency
  * member of the engine's sketch-store family (HLL `approx_distinct_merge`
  * for cardinality, DDSketch `percentile_store_merge` for quantiles,
  * Misra-Gries `heavy_hitters` for top-k): sketch once per
  * partition/shard/day, persist the binary column, answer any later
  * "how often did term X occur" rollup by counter addition — no rescan.
  *
  * Design follows the published algorithm (Cormode & Muthukrishnan, "An
  * Improved Data Stream Summary: The Count-Min Sketch and its
  * Applications", J. Algorithms 2005): a depth×width counter matrix; each
  * key increments one counter per row at position hash_d(key) mod width;
  * a point query reads the MINIMUM of its depth counters. Guarantees that
  * matter here:
  *
  *  - NEVER underestimates (every counter the key touches holds at least
  *    its true count); overestimates are bounded by εN with ε = e/width
  *    at probability 1−e^(−depth) — with width 2048, depth 4 that is
  *    ≲0.13% of the stream per query at 98% confidence, in 64 KB of
  *    state regardless of vocabulary size.
  *  - FULLY mergeable: merge = elementwise counter addition — commutative
  *    and associative, so (unlike a sampled or pruned summary) the merged
  *    sketch is BIT-identical however the input was partitioned, the
  *    repo's determinism house rule.
  *  - One pass, partial-aggregated: TypedImperativeAggregate lowers to
  *    ObjectHashAggregate with map-side partials — only 64 KB sketches
  *    shuffle, never the token stream, which is what makes a vocabulary
  *    census of a 100 TB corpus a single scan plus a constant-size merge.
  */
object CMSketch {
  /** depth 4 × width 2048: ε = e/2048 ≈ 0.13% of stream length per point
    * query, failure probability e⁻⁴ ≈ 1.8%, 64 KB per sketch. */
  val Depth = 4
  val Width = 2048

  final class Buf {
    val counts = new Array[Long](Depth * Width) // row-major [d*Width + pos]
    var total = 0L

    private def pos(bytes: Array[Byte], d: Int): Int =
      math.floorMod(MurmurHash3.bytesHash(bytes, d), Width)

    def insert(key: UTF8String): Unit = {
      val b = key.getBytes
      var d = 0
      while (d < Depth) { counts(d * Width + pos(b, d)) += 1; d += 1 }
      total += 1
    }

    def merge(o: Buf): Buf = {
      var i = 0
      while (i < counts.length) { counts(i) += o.counts(i); i += 1 }
      total += o.total
      this
    }

    /** Point-frequency estimate: min over rows — ≥ true count always. */
    def estimate(key: UTF8String): Long = {
      val b = key.getBytes
      var best = Long.MaxValue
      var d = 0
      while (d < Depth) {
        val c = counts(d * Width + pos(b, d))
        if (c < best) best = c
        d += 1
      }
      best
    }
  }

  def serialize(b: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * (b.counts.length + 1))
    val out = new DataOutputStream(bos)
    out.writeLong(b.total)
    b.counts.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new Buf
    b.total = in.readLong()
    var i = 0
    while (i < b.counts.length) { b.counts(i) = in.readLong(); i += 1 }
    b
  }
}

/** `cm_sketch(key)` → binary sketch (store it; merge later). */
case class CountMinSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CMSketch.Buf] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cm_sketch requires a STRING column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): CMSketch.Buf = new CMSketch.Buf
  override def update(buf: CMSketch.Buf, input: InternalRow): CMSketch.Buf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[UTF8String])
    buf
  }
  override def merge(a: CMSketch.Buf, b: CMSketch.Buf): CMSketch.Buf =
    a.merge(b)
  override def eval(buf: CMSketch.Buf): Any = CMSketch.serialize(buf)
  override def serialize(buf: CMSketch.Buf): Array[Byte] =
    CMSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): CMSketch.Buf =
    CMSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_cm_sketch"
  override def withNewMutableAggBufferOffset(off: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinSketchAgg =
    copy(child = newChildren.head)
}

object CountMinSketchAgg {
  import org.apache.spark.sql.GraftSqlBridge
  def apply(c: Column): Column =
    GraftSqlBridge.column(
      CountMinSketchAgg(GraftSqlBridge.expression(c)).toAggregateExpression())
}

/** `cm_merge(sketch)` — union previously-stored sketches (elementwise
  * counter addition: order-independent, bit-deterministic). */
case class CountMinMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[CMSketch.Buf]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cm_merge requires a BINARY sketch column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Option[CMSketch.Buf] = None
  override def update(buf: Option[CMSketch.Buf],
      input: InternalRow): Option[CMSketch.Buf] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = CMSketch.deserialize(v.asInstanceOf[Array[Byte]])
      buf match { case Some(b) => Some(b.merge(sk)); case None => Some(sk) }
    }
  }
  override def merge(a: Option[CMSketch.Buf],
      b: Option[CMSketch.Buf]): Option[CMSketch.Buf] = (a, b) match {
    case (Some(x), Some(y)) => Some(x.merge(y))
    case (x, None) => x
    case (None, y) => y
  }
  override def eval(buf: Option[CMSketch.Buf]): Any =
    buf.map(CMSketch.serialize).orNull
  override def serialize(buf: Option[CMSketch.Buf]): Array[Byte] =
    buf.map(CMSketch.serialize).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[CMSketch.Buf] =
    if (bytes.isEmpty) None else Some(CMSketch.deserialize(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_cm_merge"
  override def withNewMutableAggBufferOffset(off: Int): CountMinMergeAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CountMinMergeAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinMergeAgg =
    copy(child = newChildren.head)
}

object CountMinMergeAgg {
  import org.apache.spark.sql.GraftSqlBridge
  def apply(c: Column): Column =
    GraftSqlBridge.column(
      CountMinMergeAgg(GraftSqlBridge.expression(c)).toAggregateExpression())
}

/** `cm_estimate(sketch, key)` — point-frequency lookup in a (merged)
  * sketch. Interpreted eval (CodegenFallback) by design: it runs on
  * merged post-aggregation rows — a handful — never per input row. */
case class CountMinEstimate(left: Expression, right: Expression)
  extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_cm_estimate requires (BINARY sketch, STRING key), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(sk: Any, key: Any): Any =
    CMSketch.deserialize(sk.asInstanceOf[Array[Byte]])
      .estimate(key.asInstanceOf[UTF8String])

  override def dataType: DataType = LongType
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}

object CountMinEstimate {
  import org.apache.spark.sql.GraftSqlBridge
  def apply(sk: Column, key: Column): Column =
    GraftSqlBridge.column(CountMinEstimate(
      GraftSqlBridge.expression(sk), GraftSqlBridge.expression(key)))
}
