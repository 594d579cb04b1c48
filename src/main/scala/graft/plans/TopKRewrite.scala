package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the standard window-function top-k idiom
  *
  * {{{
  *   SELECT <cols> FROM (
  *     SELECT *, row_number() OVER (PARTITION BY k ORDER BY o) AS rn FROM t)
  *   WHERE rn <= K            -- (and rn is not selected)
  * }}}
  *
  * into the native [[TopKPerKey]] operator. The window form shuffles and
  * fully sorts EVERY row of every partition just to discard all but K of
  * them; the rewritten plan keeps a bounded heap per key BEFORE the
  * exchange, so only ≤ K·partitions rows per key ever move (see
  * [[TopKPerKey]]'s scaladoc). Users keep writing the idiomatic SQL; the
  * engine substitutes the plan it wishes the optimizer had.
  *
  * Fire conditions (all checked, otherwise the plan is left untouched):
  *  - the Window computes EXACTLY one expression: an unaliased-downstream
  *    `row_number()` over the default (UNBOUNDED PRECEDING, CURRENT ROW)
  *    row frame with a non-empty ORDER BY;
  *  - the Filter is `rn <= lit` / `rn < lit` / `rn = 1` (literal int > 0)
  *    over exactly that attribute, with no other conjuncts — composite
  *    predicates keep the built-in plan (Spark already splits conjunctions,
  *    so the common case arrives in this shape);
  *  - every partition/order expression is deterministic.
  *
  * When the enclosing Project references `rn` (the "give me the ranks"
  * form), the rewrite still fires: [[TopKPerKey]]'s final stage emits each
  * row's 1-based in-key position under the window alias's own attribute id,
  * so downstream references resolve unchanged. The rank is well-defined
  * because the ordering is total (unique-tiebreak house rule — the same
  * assumption the deterministic window form already makes).
  *
  * Ordering caveat, by design: like every relational operator, the rewrite
  * guarantees SET equality, not row order — the window form's incidental
  * intra-partition ordering is not part of its contract either (any
  * downstream consumer needing order must sort explicitly).
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private def rowNumberLimit(cond: Expression, rn: ExprId): Option[Int] =
    cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(k: Int, _))
        if a.exprId == rn && k > 0 => Some(k)
      case LessThan(a: AttributeReference, Literal(k: Int, _))
        if a.exprId == rn && k > 1 => Some(k - 1)
      case EqualTo(a: AttributeReference, Literal(1, _))
        if a.exprId == rn => Some(1)
      case GreaterThanOrEqual(Literal(k: Int, _), a: AttributeReference)
        if a.exprId == rn && k > 0 => Some(k)
      case _ => None
    }

  private def isDefaultRowNumberFrame(spec: WindowSpecDefinition): Boolean =
    spec.orderSpec.nonEmpty && (spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
      case _ => false
    })

  /** Spark 3.5+'s InferWindowGroupLimit may already have slid a
    * WindowGroupLimit under the Window (sort-based partial group
    * pruning). Our heap-based operator supersedes it — keeping it
    * would re-introduce the two full sorts the rewrite exists to
    * avoid — so unwrap it, but ONLY one that belongs to THIS
    * Window (same partition/order spec, row_number ranking): an
    * unrelated group limit must survive the rewrite. */
  private def unwrapGroupLimit(child: LogicalPlan,
      partSpec: Seq[Expression], orderSpec: Seq[SortOrder]): LogicalPlan =
    child match {
      case WindowGroupLimit(ps, os, RowNumber(), _, c)
        if ps == partSpec && os == orderSpec => c
      case c => c
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projectList,
        Filter(cond,
          Window(Seq(al @ Alias(
            WindowExpression(RowNumber(), spec: WindowSpecDefinition), _)),
            partSpec, orderSpec, child, _)))
        if isDefaultRowNumberFrame(spec) &&
          (partSpec ++ orderSpec).forall(_.deterministic) &&
          projectList.forall(ne => ne.references.subsetOf(
            AttributeSet(child.output :+ al.toAttribute))) =>
      rowNumberLimit(cond, al.exprId) match {
        case Some(k) =>
          // emit the rank column only when the result actually consumes it
          val needRank =
            projectList.exists(_.references.exists(_.exprId == al.exprId))
          Project(projectList, TopKPerKey(partSpec, orderSpec, k,
            unwrapGroupLimit(child, partSpec, orderSpec),
            if (needRank) Some(al.toAttribute) else None))
        case None => p
      }
    // projectless form: the Filter's full output (rows + rank) is consumed
    // downstream — substitute the node with the rank emitted, same schema
    case f @ Filter(cond,
        Window(Seq(al @ Alias(
          WindowExpression(RowNumber(), spec: WindowSpecDefinition), _)),
          partSpec, orderSpec, child, _))
        if isDefaultRowNumberFrame(spec) &&
          (partSpec ++ orderSpec).forall(_.deterministic) =>
      rowNumberLimit(cond, al.exprId) match {
        case Some(k) =>
          TopKPerKey(partSpec, orderSpec, k,
            unwrapGroupLimit(child, partSpec, orderSpec), Some(al.toAttribute))
        case None => f
      }
  }
}
