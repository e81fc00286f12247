package graft.plans

import graft.functions.IntersectSize
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Optimizer rule: `size(array_intersect(a, b))` over string arrays →
  * [[graft.functions.IntersectSize]].
  *
  * `ArrayIntersect` allocates the intersection array per row; when the only
  * consumer is `size(...)` — the shape of every set-overlap similarity
  * verify (Jaccard, set cosine) — the allocation is pure waste. The rewrite
  * keeps query code declarative (`size(array_intersect(...))` is the
  * portable, catalog-function formulation) and makes the fused kernel a
  * session-level property, the same way Spark's own `ReplaceExpressions`
  * lowers `nvl`/`ifnull`.
  *
  * Restricted to `legacySizeOfNull = false` (three-valued `size`): the
  * fused expression returns null on null input, which matches modern
  * `size` but not the legacy -1 convention.
  */
object FuseIntersectSize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ai @ ArrayIntersect(l, r), false)
          if ai.resolved &&
            l.dataType.isInstanceOf[ArrayType] &&
            l.dataType.asInstanceOf[ArrayType].elementType == StringType &&
            r.dataType.isInstanceOf[ArrayType] &&
            r.dataType.asInstanceOf[ArrayType].elementType == StringType =>
        IntersectSize(l, r)
    }
}
