package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: the declarative per-key top-k pattern
  *
  * {{{
  *   Project [child cols only]
  *     Filter (rn <= K)            -- or rn < K+1, rn = 1
  *       Window [row_number() over (partition by p order by o) AS rn]
  *         child
  * }}}
  *
  * rewrites to `Project(TopKPerKey(p, o, K, child))` — the bounded-heap
  * operator — whenever the rank column is dropped by the enclosing
  * projection (if rn survives, the window's numbering semantics are
  * observable and the rewrite does not apply). Users keep writing the
  * portable window formulation; sessions with [[GraftExtensions]] get the
  * sort-free physical plan automatically, the same contract as
  * [[FuseIntersectSize]].
  *
  * Conservative by construction: only a single row_number window
  * expression, only a literal bound, only deterministic sort orders, and
  * the projection must reference nothing but the window child's output.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  /** The filter bound as top-k count, if the condition is one of the
    * recognized shapes on the given rank attribute.
    */
  private def boundOf(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k))
        if a.exprId == rn.exprId && k >= 1 => Some(k)
      case LessThan(a: AttributeReference, IntegerLiteral(k))
        if a.exprId == rn.exprId && k >= 2 => Some(k - 1)
      case EqualTo(a: AttributeReference, IntegerLiteral(1))
        if a.exprId == rn.exprId => Some(1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList,
        Filter(cond,
          Window(Seq(alias @ Alias(
            WindowExpression(RowNumber(), WindowSpecDefinition(part, order, _)),
            _)), _, _, child, _))) =>
      val rn = alias.toAttribute
      val usable =
        order.nonEmpty && order.forall(_.deterministic) &&
        part.forall(_.deterministic) &&
        // the projection must drop the rank and touch only child columns
        projList.forall(_.references.subsetOf(child.outputSet))
      boundOf(cond, rn) match {
        case Some(k) if usable =>
          Project(projList, TopKPerKey(part, order, k, child))
        case _ => p
      }
  }
}
