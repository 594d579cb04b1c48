package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Mergeable relative-error quantile sketch over log-scale buckets — the
  * percentile analogue of the HLL pattern in `approx_distinct_merge`:
  * sketch once per partition/day, PERSIST the binary column, and answer
  * any later rollup by bin-count addition instead of a rescan.
  *
  * Design follows the published DDSketch algorithm (Masson, Rim, Lee,
  * "DDSketch: A Fast and Fully-Mergeable Quantile Sketch with
  * Relative-Error Guarantees", VLDB 2019): a value v > 0 lands in bucket
  * ⌈log_γ v⌉ with γ = (1+α)/(1-α), so returning the bucket's
  * relative-midpoint 2γ^i/(γ+1) guarantees relative error ≤ α for EVERY
  * quantile. Negative values mirror into their own bucket map; zeros get
  * a dedicated counter. Properties that matter here:
  *
  *  - FULLY mergeable: merge = per-bucket count addition — commutative
  *    and associative, so the result is bit-identical no matter how the
  *    input was partitioned or in which order partials combine (stronger
  *    than KLL/t-digest, whose merge is order-sensitive; and exactly the
  *    determinism house rule).
  *  - Bounded state: bucket count is capped; on overflow the
  *    lowest-magnitude buckets collapse together (the paper's collapsing
  *    variant), degrading accuracy only at the distribution's low tail.
  *  - One pass, partial-aggregated: TypedImperativeAggregate lowers to
  *    ObjectHashAggregate with map-side partials — only sketches shuffle,
  *    never values, the property that makes per-group percentiles of a
  *    100 TB fact table a single scan.
  */
object QSketch {
  /** Max stored buckets per sign before low-tail collapsing. 2048 buckets
    * at α=0.01 span ~41 orders of magnitude — far beyond any physical
    * measurement range; the cap exists for adversarial inputs. */
  val MaxBins = 2048

  final class Buf(val alpha: Double) {
    val gamma: Double = (1 + alpha) / (1 - alpha)
    private val logGamma = math.log(gamma)
    val pos = mutable.HashMap.empty[Int, Long]
    val neg = mutable.HashMap.empty[Int, Long]
    var zeros = 0L

    private def bucketOf(mag: Double): Int =
      math.ceil(math.log(mag) / logGamma).toInt

    def insert(v: Double): Unit =
      if (v == 0.0 || v.isNaN) { if (v == 0.0) zeros += 1 } // NaNs dropped
      else if (v > 0) bump(pos, bucketOf(v), 1L)
      else bump(neg, bucketOf(-v), 1L)

    private def bump(m: mutable.HashMap[Int, Long], i: Int, c: Long): Unit = {
      m(i) = m.getOrElse(i, 0L) + c
      if (m.size > MaxBins) collapse(m)
    }

    /** Collapse the two lowest-magnitude buckets (paper §2.3): accuracy
      * degrades only for quantiles that land in the collapsed low tail. */
    private def collapse(m: mutable.HashMap[Int, Long]): Unit = {
      val ks = m.keysIterator.toArray.sorted
      val (lo, next) = (ks(0), ks(1))
      m(next) = m(next) + m(lo)
      m.remove(lo)
    }

    def merge(o: Buf): Buf = {
      require(math.abs(alpha - o.alpha) < 1e-12,
        s"cannot merge sketches with different alpha: $alpha vs ${o.alpha}")
      o.pos.foreach { case (i, c) => bump(pos, i, c) }
      o.neg.foreach { case (i, c) => bump(neg, i, c) }
      zeros += o.zeros
      this
    }

    def count: Long = zeros + pos.valuesIterator.sum + neg.valuesIterator.sum

    /** Quantile estimate: walk buckets in value order (most-negative →
      * zero → most-positive) to the target rank, return the bucket's
      * relative midpoint. */
    def quantile(q: Double): Double = {
      val n = count
      if (n == 0) return Double.NaN
      val target = (q * (n - 1)).toLong
      var cum = 0L
      // negatives: larger magnitude = smaller value → descending bucket id
      for (i <- neg.keysIterator.toArray.sortBy(-_)) {
        cum += neg(i)
        if (cum > target) return -2.0 * math.pow(gamma, i) / (gamma + 1)
      }
      cum += zeros
      if (cum > target) return 0.0
      for (i <- pos.keysIterator.toArray.sorted) {
        cum += pos(i)
        if (cum > target) return 2.0 * math.pow(gamma, i) / (gamma + 1)
      }
      Double.NaN // unreachable: cum = n > target by then
    }
  }

  def serialize(b: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(b.alpha)
    out.writeLong(b.zeros)
    def wm(m: mutable.HashMap[Int, Long]): Unit = {
      out.writeInt(m.size)
      m.foreach { case (i, c) => out.writeInt(i); out.writeLong(c) }
    }
    wm(b.pos); wm(b.neg)
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new Buf(in.readDouble())
    b.zeros = in.readLong()
    def rm(m: mutable.HashMap[Int, Long]): Unit =
      (1 to in.readInt()).foreach(_ => m(in.readInt()) = in.readLong())
    rm(b.pos); rm(b.neg)
    b
  }
}

/** `quantile_sketch(value, α)` → binary sketch (store it; merge later). */
case class QuantileSketchAgg(
    child: Expression,
    alpha: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketch.Buf] {

  require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_quantile_sketch requires a DOUBLE column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): QSketch.Buf = new QSketch.Buf(alpha)
  override def update(buf: QSketch.Buf, input: InternalRow): QSketch.Buf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }
  override def merge(a: QSketch.Buf, b: QSketch.Buf): QSketch.Buf = a.merge(b)
  override def eval(buf: QSketch.Buf): Any = QSketch.serialize(buf)
  override def serialize(buf: QSketch.Buf): Array[Byte] = QSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QSketch.Buf =
    QSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_quantile_sketch"
  override def withNewMutableAggBufferOffset(off: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren.head)
}

object QuantileSketchAgg {
  import org.apache.spark.sql.GraftSqlBridge
  def apply(c: Column, alpha: Double): Column =
    GraftSqlBridge.column(
      QuantileSketchAgg(GraftSqlBridge.expression(c), alpha)
        .toAggregateExpression())
}

/** `quantile_merge(sketch)` — union previously-stored sketches (the
  * hll_union_agg twin). Pure bucket addition: order-independent. */
case class QuantileMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[QSketch.Buf]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_quantile_merge requires a BINARY sketch column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Option[QSketch.Buf] = None
  override def update(buf: Option[QSketch.Buf],
      input: InternalRow): Option[QSketch.Buf] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = QSketch.deserialize(v.asInstanceOf[Array[Byte]])
      buf match { case Some(b) => Some(b.merge(sk)); case None => Some(sk) }
    }
  }
  override def merge(a: Option[QSketch.Buf],
      b: Option[QSketch.Buf]): Option[QSketch.Buf] = (a, b) match {
    case (Some(x), Some(y)) => Some(x.merge(y))
    case (x, None) => x
    case (None, y) => y
  }
  override def eval(buf: Option[QSketch.Buf]): Any =
    buf.map(QSketch.serialize).orNull
  override def serialize(buf: Option[QSketch.Buf]): Array[Byte] =
    buf.map(QSketch.serialize).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[QSketch.Buf] =
    if (bytes.isEmpty) None else Some(QSketch.deserialize(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_quantile_merge"
  override def withNewMutableAggBufferOffset(off: Int): QuantileMergeAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): QuantileMergeAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileMergeAgg =
    copy(child = newChildren.head)
}

object QuantileMergeAgg {
  import org.apache.spark.sql.GraftSqlBridge
  def apply(c: Column): Column =
    GraftSqlBridge.column(
      QuantileMergeAgg(GraftSqlBridge.expression(c)).toAggregateExpression())
}

/** `quantile_estimate(sketch, q)` — read a quantile out of a (merged)
  * sketch. Interpreted eval (CodegenFallback) by design: it runs on
  * merged per-group rows — a handful after aggregation — never in the
  * per-value hot path. */
case class QuantileEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_quantile_estimate requires (BINARY sketch, DOUBLE quantile), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(sk: Any, q: Any): Any =
    QSketch.deserialize(sk.asInstanceOf[Array[Byte]])
      .quantile(q.asInstanceOf[Double])

  override def dataType: DataType = DoubleType
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileEstimate =
    copy(left = newLeft, right = newRight)
}

object QuantileEstimate {
  import org.apache.spark.sql.GraftSqlBridge
  def apply(sk: Column, q: Double): Column =
    GraftSqlBridge.column(QuantileEstimate(
      GraftSqlBridge.expression(sk),
      org.apache.spark.sql.catalyst.expressions.Literal(q)))
}
