package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for `Σ (aᵢ−bᵢ)²` over two `array<double>`
  * columns — the k-means assignment inner loop ([[graft.ml.IvfIndex]]
  * evaluates it k times per row per Lloyd iteration).
  *
  * Same rationale as [[DotProduct]] (build-charter preference (b)): the
  * composed form `dot(zip_with(a,b,(x,y)->x−y), …)` allocates a diff
  * array and runs two interpreter lambdas per element; this is one tight
  * fused loop that whole-stage codegen inlines. The accumulation is the
  * SAME sequential left-to-right `acc += d·d` fold the HOF pipeline
  * performs, so results are bit-identical — swapping it in cannot move a
  * centroid, a cell boundary, or any oracle answer.
  *
  * Nulls: a null array on either side yields null (BinaryExpression's
  * null-intolerant default); null elements are not expected (embeddings
  * are dense) and read as 0.0 per ArrayData.getDouble semantics.
  */
case class Dist2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dist2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dist2 =
    copy(left = newLeft, right = newRight)
}

object Dist2 {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column-API entry point: `dist2(a, b)`. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      Dist2(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
