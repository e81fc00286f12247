package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, Alias, ArrayDistinct, AttributeReference, CreateArray, EqualTo, Explode, Expression, GreaterThanOrEqual, LessThanOrEqual, Literal, PredicateHelper, Subtract}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: a pure range join
  *
  * {{{  a JOIN b ON abs(ka - kb) <= C [AND other predicates]  }}}
  *
  * (no equi conjunct, long keys, literal C > 0) is the plan shape that
  * forces a BroadcastNestedLoopJoin — N·M comparisons, dead at any scale.
  * This rule rewrites it into the binned EQUI-join that
  * `join_range_binned` spells out by hand: bucket each key into
  * C-wide bins, explode the LEFT side to its bin and both neighbors (bin
  * width equals the range bound, so every qualifying pair shares an
  * exploded bin), equi-join on the bin, and keep the ORIGINAL predicate
  * as the exact filter. Shuffle cost becomes 3·N + M rows on bin keys
  * instead of N·M comparisons — the rewrite production range-join
  * optimizers apply — while users keep writing the naive declarative
  * form (`join_range_auto` is exactly that; PlanSpec pins that no
  * nested-loop survives).
  *
  * Correctness: each left row explodes to its bin and both neighbors
  * (deduplicated, so a pair joins at most once) and each right row has
  * exactly one bin; the exact predicate re-applied on top makes bin
  * false positives (neighbors farther than C) disappear. Null keys
  * produce null bins, which never satisfy the equi-join — matching the
  * BNLJ, where a null comparison filters the row. Bins use a wrap-safe
  * floor division (truncating `div` corrected by the remainder's sign —
  * never the `e - pmod(e, w)` form, whose subtract overflows for keys
  * within `w` of Long.MinValue) so every representable key lands in its
  * mathematical bin; the ±1 neighbor bins clamp at Long.{Min,Max}Value
  * (reachable only when width == 1) instead of wrapping. In the corner
  * where `l - r` itself overflows (keys straddling more than Long.MaxValue
  * apart), the rewrite returns the mathematically-correct empty match for
  * the pair, where the unrewritten BNLJ would raise under ANSI mode or
  * admit the wrapped-difference pair silently with ANSI off — the rewrite
  * never evaluates the subtraction on non-candidate pairs.
  *
  * Conservative by construction: Inner joins only, batch only, exactly
  * the `abs(l - r) <= C` conjunct shape on LongType expressions with a
  * positive literal bound, and never when ANY equi conjunct exists (an
  * equi key means the join already hashes fine).
  */
object RewriteBinnedRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  import BinnedJoins.{bin, clampedHi, clampedLo, hasEquiConjunct}

  /** The (leftKey, rightKey, width) of the first `abs(l - r) <= C`
    * conjunct whose operands split cleanly across the join sides.
    */
  private def rangeConjunct(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Long)] = {
    def split(a: Expression, b: Expression, c: Long) = {
      val ok = a.deterministic && b.deterministic &&
        a.dataType == LongType && b.dataType == LongType && c > 0
      if (!ok) None
      else if (canEvaluate(a, left) && canEvaluate(b, right)) Some((a, b, c))
      else if (canEvaluate(b, left) && canEvaluate(a, right)) Some((b, a, c))
      else None
    }
    conjuncts.collectFirst(Function.unlift {
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), Literal(c: Long, LongType)) =>
        split(a, b, c)
      case GreaterThanOrEqual(Literal(c: Long, LongType), Abs(Subtract(a, b, _), _)) =>
        split(a, b, c)
      case _ => None
    })
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && !j.isStreaming =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasEquiConjunct(conjuncts, left, right)) j
      else rangeConjunct(conjuncts, left, right) match {
        case None => j
        case Some((lk, rk, width)) =>
          // bin the left side once in a Project so the explode reads an
          // attribute, then emit {bin-1, bin, bin+1} with the ±1 clamped
          // at the Long domain edges (reachable only when width == 1);
          // array_distinct keeps the at-most-once join guarantee when a
          // clamp collapses a neighbor onto the bin itself.
          val binLAlias = Alias(bin(lk, width), "_graft_bin_l")()
          val projL = Project(left.output :+ binLAlias, left)
          val b = binLAlias.toAttribute
          val genOut = AttributeReference("_graft_bin", LongType)()
          val gen = Generate(
            Explode(ArrayDistinct(CreateArray(Seq(
              clampedLo(b), b, clampedHi(b))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(genOut), child = projL)
          val binRAlias = Alias(bin(rk, width), "_graft_bin_r")()
          val proj = Project(right.output :+ binRAlias, right)
          Project(left.output ++ right.output,
            Join(gen, proj, Inner,
              Some(conjuncts.foldLeft[Expression](
                EqualTo(genOut, binRAlias.toAttribute))(
                (acc, c) => org.apache.spark.sql.catalyst.expressions.And(acc, c))),
              hint))
      }
  }
}
