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
  * The same idiom with `rank()` or `dense_rank()` in place of
  * `row_number()` lowers to the identical plan shape with the operator in
  * the matching [[TopKMode]] — tie classes are retained in full, so the
  * filter's exact row set (which can exceed K on boundary ties) and the
  * emitted rank values match the window form.
  *
  * Fire conditions (all checked, otherwise the plan is left untouched):
  *  - the Window computes EXACTLY one expression: an unaliased-downstream
  *    `row_number()`/`rank()`/`dense_rank()` over its default
  *    (UNBOUNDED PRECEDING, CURRENT ROW) frame with a non-empty ORDER BY;
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

  /** row_number / rank / dense_rank → the [[TopKMode]] the operator runs
    * in; any other window function keeps the built-in plan. */
  private def modeOf(fn: Expression): Option[TopKMode] = fn match {
    case RowNumber()   => Some(TopKMode.RowNum)
    case Rank(_)       => Some(TopKMode.Rank)
    case DenseRank(_)  => Some(TopKMode.DenseRank)
    case _             => None
  }

  /** All three ranking functions IGNORE the window frame, but the
    * analyzer stamps each with its default — ROWS unbounded-to-current
    * for row_number, RANGE unbounded-to-current for rank/dense_rank.
    * Accept exactly those shapes (an explicit nonstandard frame on a
    * ranking function is analyzer-rejected anyway, but stay strict). */
  private def isDefaultRankingFrame(spec: WindowSpecDefinition): Boolean =
    spec.orderSpec.nonEmpty && (spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
      case SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow) => true
      case _ => false
    })

  /** Spark 3.5+'s InferWindowGroupLimit may already have slid a
    * WindowGroupLimit under the Window (sort-based partial group
    * pruning). Our heap-based operator supersedes it — keeping it
    * would re-introduce the two full sorts the rewrite exists to
    * avoid — so unwrap it, but ONLY one that belongs to THIS
    * Window (same partition/order spec, same ranking function): an
    * unrelated group limit must survive the rewrite. */
  private def unwrapGroupLimit(child: LogicalPlan, mode: TopKMode,
      partSpec: Seq[Expression], orderSpec: Seq[SortOrder]): LogicalPlan =
    child match {
      case WindowGroupLimit(ps, os, fn, _, c)
        if ps == partSpec && os == orderSpec && modeOf(fn).contains(mode) => c
      case c => c
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projectList,
        Filter(cond,
          Window(Seq(al @ Alias(
            WindowExpression(fn, spec: WindowSpecDefinition), _)),
            partSpec, orderSpec, child, _)))
        if modeOf(fn).isDefined && isDefaultRankingFrame(spec) &&
          (partSpec ++ orderSpec).forall(_.deterministic) &&
          projectList.forall(ne => ne.references.subsetOf(
            AttributeSet(child.output :+ al.toAttribute))) =>
      (rowNumberLimit(cond, al.exprId), modeOf(fn)) match {
        case (Some(k), Some(mode)) =>
          // emit the rank column only when the result actually consumes it
          val needRank =
            projectList.exists(_.references.exists(_.exprId == al.exprId))
          Project(projectList, TopKPerKey(partSpec, orderSpec, k,
            unwrapGroupLimit(child, mode, partSpec, orderSpec),
            if (needRank) Some(al.toAttribute) else None, mode))
        case _ => p
      }
    // projectless form: the Filter's full output (rows + rank) is consumed
    // downstream — substitute the node with the rank emitted, same schema
    case f @ Filter(cond,
        Window(Seq(al @ Alias(
          WindowExpression(fn, spec: WindowSpecDefinition), _)),
          partSpec, orderSpec, child, _))
        if modeOf(fn).isDefined && isDefaultRankingFrame(spec) &&
          (partSpec ++ orderSpec).forall(_.deterministic) =>
      (rowNumberLimit(cond, al.exprId), modeOf(fn)) match {
        case (Some(k), Some(mode)) =>
          TopKPerKey(partSpec, orderSpec, k,
            unwrapGroupLimit(child, mode, partSpec, orderSpec),
            Some(al.toAttribute), mode)
        case _ => f
      }
  }
}
