package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for product-quantization code assignment:
  * given a unit vector and M per-subspace codebooks, return the M argmin
  * code ids — the hot inner loop of PQ training and encoding
  * (`ml/PqIndex.scala`).
  *
  * Why a custom Expression (preference order (b) from the build charter,
  * the [[DotProduct]] precedent): M·K = hundreds of distance evaluations
  * per row can't stay compiled any other way — an unrolled struct tree
  * blows the generated-method limits, and a `transform` lambda over a
  * codebook literal evaluates interpreted per element (higher-order
  * functions don't join whole-stage codegen). Measured on the sf0.1
  * corpus, both forms plateau ~20 µs/row; this loop is ~1 µs/row.
  *
  * Determinism: subspaces scan in order, codes in id order, squared
  * distance accumulates left-to-right, and the running min updates on
  * STRICT less-than — ties keep the lowest code id, the IVF trainer's
  * (d, code) argmin rule. Interpreted and generated paths perform the
  * identical operation sequence, so they are bit-identical.
  *
  * The codebooks ride along as a referenced `double[M][K][subDim]` (the
  * standard model-literal device, like a broadcast ML parameter); the
  * input vector must have exactly M·subDim elements.
  */
case class PqAssign(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = books.length
  private val k = books(0).length
  private val subDim = books(0)(0).length

  // Case-class equality on a nested Array is reference identity, which
  // would make structurally identical PqAssigns compare unequal under
  // semanticEquals/canonicalization (defeating subexpression elimination)
  // — deep-compare the codebooks instead. Arrays.deepEquals/deepHashCode
  // recurse through the nested primitive arrays.
  override def equals(other: Any): Boolean = other match {
    case that: PqAssign =>
      child == that.child && java.util.Arrays.deepEquals(
        books.asInstanceOf[Array[AnyRef]],
        that.books.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(books.asInstanceOf[Array[AnyRef]])

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_assign"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * subDim) {
      throw new IllegalArgumentException(
        s"graft_pq_assign: vector has ${v.numElements()} elements, " +
          s"codebooks expect ${m * subDim}")
    }
    // loud null-element guard (the GramBuf rule): ArrayData.getDouble on
    // a null slot silently reads 0.0, which would code the vector as if
    // that dimension were zero — corrupt codes with no error
    var ni = 0
    while (ni < v.numElements()) {
      if (v.isNullAt(ni)) throw new IllegalArgumentException(
        s"graft_pq_assign: null element at index $ni")
      ni += 1
    }
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val base = mi * subDim
      var best = Double.PositiveInfinity
      var bestK = 0
      var ki = 0
      while (ki < k) {
        val c = books(mi)(ki)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val t = v.getDouble(base + j) - c(j)
          d += t * t
          j += 1
        }
        if (d < best) { best = d; bestK = ki }
        ki += 1
      }
      codes(mi) = bestK
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.addReferenceObj("pqBooks", books, "double[][][]")
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi")
      val ki = ctx.freshName("ki")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      val bestK = ctx.freshName("bestK")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val c = ctx.freshName("cvec")
      s"""
         |if ($v.numElements() != ${m * subDim}) {
         |  throw new IllegalArgumentException(
         |    "graft_pq_assign: vector has " + $v.numElements() +
         |    " elements, codebooks expect ${m * subDim}");
         |}
         |for (int $j = 0; $j < ${m * subDim}; $j++) {
         |  if ($v.isNullAt($j)) throw new IllegalArgumentException(
         |    "graft_pq_assign: null element at index " + $j);
         |}
         |int[] $codes = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestK = 0;
         |  for (int $ki = 0; $ki < $k; $ki++) {
         |    double[] $c = $b[$mi][$ki];
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      double $t = $v.getDouble($mi * $subDim + $j) - $c[$j];
         |      $d += $t * $t;
         |    }
         |    if ($d < $best) { $best = $d; $bestK = $ki; }
         |  }
         |  $codes[$mi] = $bestK;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqAssign =
    copy(child = newChild)
}

object PqAssign {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column-API entry point: `pq_assign(vn)` with the codebooks bound. */
  def apply(v: Column, books: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(PqAssign(GraftSqlBridge.expression(v), books))
}
