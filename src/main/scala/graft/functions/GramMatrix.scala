package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable second-moment (Gram) aggregate over an `array<double>`
  * vector column: one pass accumulates the count, the per-dimension sum,
  * and the upper triangle of Σ vᵢvⱼ — everything a covariance matrix (and
  * hence PCA, whitening, Mahalanobis scoring) needs, in
  * 1 + d + d(d+1)/2 doubles of state (d=64 → ~17 KB).
  *
  * The fifth member of the engine's mergeable-aggregate family (SimHash
  * counters, Misra-Gries, DDSketch, Count-Min): merge is elementwise
  * addition, so only matrix-sized partials shuffle — the covariance of a
  * 100 TB embedding corpus is one scan plus a model-sized reduce, the
  * exact shape `ml/Pca.fit` consumes. The per-row update is a tight JVM
  * loop over the triangle (d(d+1)/2 multiply-adds), not an exploded
  * (i, j) pair stream — the explode form would generate d²/2 rows per
  * vector through a shuffle.
  *
  * Determinism caveat (same as every FP mean in the repo's ML corner):
  * double addition is partition-order-sensitive, so consumers are
  * rows-only keys pinned by ScalaTest invariants, never DuckDB oracles.
  *
  * Output layout (array<double>): [n, s₀…s_{d−1}, g₀₀, g₀₁…g₀_{d−1},
  * g₁₁…] — count, sums, then the upper triangle row by row.
  */
object GramBuf {
  /** Dimensionality ceiling. The O(d²) per-partition partial is ~17 KB at
    * d=64 and ~8 MB at d=1024 — still fine as aggregation state (it rides
    * partial aggregation like any sketch) — but ~800 MB at d=10⁴, which
    * would OOM executors long before the aggregate sees a second row. The
    * cap makes the failure a loud analysis-time error instead. Past it,
    * the published remedies change the ALGORITHM, not the constant: block
    * the Gram matrix into d/b × d/b tiles aggregated as separate
    * (i-block, j-block) group keys (each partial is b² — a tree of
    * bounded merges), or switch to randomized sketched PCA
    * (Halko-Martinsson-Tropp 2011: project to a k+p dim sketch first) —
    * both keep the one-scan shape [[graft.ml.Pca]] relies on. */
  val MaxDim = 2048

  def triLen(d: Int): Int = d * (d + 1) / 2

  final class Buf(val d: Int) {
    var n = 0L
    val s = new Array[Double](d)
    val g = new Array[Double](triLen(d))

    def insert(v: ArrayData): Unit = {
      require(v.numElements() == d,
        s"graft_gram: vector has ${v.numElements()} elements, expected $d")
      // the SQL type admits containsNull=true; reading a null element as
      // 0.0 while still counting the row would silently skew the
      // mean/covariance — reject loudly instead
      var i = 0
      while (i < d) {
        require(!v.isNullAt(i), s"graft_gram: null element at index $i")
        i += 1
      }
      i = 0
      var t = 0
      while (i < d) {
        val vi = v.getDouble(i)
        s(i) += vi
        var j = i
        while (j < d) { g(t) += vi * v.getDouble(j); j += 1; t += 1 }
        i += 1
      }
      n += 1
    }

    def merge(o: Buf): Buf = {
      require(d == o.d, s"graft_gram: dim mismatch $d vs ${o.d}")
      var i = 0
      while (i < d) { s(i) += o.s(i); i += 1 }
      i = 0
      while (i < g.length) { g(i) += o.g(i); i += 1 }
      n += o.n
      this
    }

    def toArray: Array[Double] = {
      val out = new Array[Double](1 + d + g.length)
      out(0) = n.toDouble
      System.arraycopy(s, 0, out, 1, d)
      System.arraycopy(g, 0, out, 1 + d, g.length)
      out
    }
  }

  def serialize(b: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * (2 + b.d + b.g.length))
    val out = new DataOutputStream(bos)
    out.writeInt(b.d)
    out.writeLong(b.n)
    b.s.foreach(out.writeDouble)
    b.g.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new Buf(in.readInt())
    b.n = in.readLong()
    var i = 0
    while (i < b.d) { b.s(i) = in.readDouble(); i += 1 }
    i = 0
    while (i < b.g.length) { b.g(i) = in.readDouble(); i += 1 }
    b
  }
}

/** `graft_gram(v, d)` → array<double> [n, sums, upper-triangle gram]. */
case class GramMatrixAgg(
    child: Expression,
    d: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuf.Buf] {

  require(d > 0, s"graft_gram dim must be positive, got $d")
  require(d <= GramBuf.MaxDim,
    s"graft_gram dim $d exceeds the O(d^2)-state ceiling ${GramBuf.MaxDim}" +
      " (the partial buffer would be " + (4L * d * (d + 1L) / 1048576) +
      " MB per partition); block the matrix into tile-keyed aggregates or" +
      " use a randomized sketch for higher dimensions — see GramBuf.MaxDim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_gram requires an array<double> column, got ${dt.sql}")
  }

  override def createAggregationBuffer(): GramBuf.Buf = new GramBuf.Buf(d)
  override def update(buf: GramBuf.Buf, input: InternalRow): GramBuf.Buf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[ArrayData])
    buf
  }
  override def merge(a: GramBuf.Buf, b: GramBuf.Buf): GramBuf.Buf = a.merge(b)
  override def eval(buf: GramBuf.Buf): Any = new GenericArrayData(buf.toArray)
  override def serialize(buf: GramBuf.Buf): Array[Byte] =
    GramBuf.serialize(buf)
  override def deserialize(bytes: Array[Byte]): GramBuf.Buf =
    GramBuf.deserialize(bytes)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_gram"
  override def withNewMutableAggBufferOffset(off: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMatrixAgg =
    copy(child = newChildren.head)
}

object GramMatrixAgg {
  import org.apache.spark.sql.GraftSqlBridge
  def apply(c: Column, d: Int): Column =
    GraftSqlBridge.column(
      GramMatrixAgg(GraftSqlBridge.expression(c), d).toAggregateExpression())
}
