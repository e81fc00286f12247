package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, Alias, ArrayDistinct, AttributeReference, CaseWhen, CreateArray, EqualTo, Explode, Expression, GreaterThan, GreaterThanOrEqual, IntegralDivide, LessThan, LessThanOrEqual, Literal, PredicateHelper, Remainder, Subtract}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Shared machinery for the binned join rewrites
  * ([[RewriteBinnedRangeJoin]], [[RewriteIntervalJoin]]): the wrap-safe
  * floor-division bin and the clamped ±1 neighbors. One definition site so
  * the two rules cannot drift onto different bin arithmetic.
  */
private[plans] object BinnedJoins extends PredicateHelper {

  /** Floor division e / width (width > 0) for any-sign e, wrap-safe over
    * the full Long domain: truncating `div`, minus one when the remainder
    * is negative. No intermediate can overflow — `e div w` and `e % w`
    * are total for w > 0, and the -1 correction only fires when |q| is
    * at most Long.MaxValue / 2 (w >= 2; w == 1 has remainder 0).
    */
  def bin(e: Expression, width: Long): Expression = {
    val q = IntegralDivide(e, Literal(width))
    val r = Remainder(e, Literal(width))
    CaseWhen(Seq((LessThan(r, Literal(0L)), Subtract(q, Literal(1L)))), q)
  }

  /** b - 1 clamped at Long.MinValue (reachable only when width == 1). */
  def clampedLo(b: Expression): Expression =
    CaseWhen(Seq((GreaterThan(b, Literal(Long.MinValue)),
      Subtract(b, Literal(1L)))), b)

  /** b + 1 clamped at Long.MaxValue (reachable only when width == 1). */
  def clampedHi(b: Expression): Expression =
    CaseWhen(Seq((LessThan(b, Literal(Long.MaxValue)),
      Add(b, Literal(1L)))), b)

  /** Any plain equi conjunct across the sides — if one exists the join
    * already hashes fine and the rewrites must stand down.
    */
  def hasEquiConjunct(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (canEvaluate(a, left) && canEvaluate(b, right)) ||
          (canEvaluate(b, left) && canEvaluate(a, right))
      case _ => false
    }
}

/** Optimizer rule: a pure point-in-interval join
  *
  * {{{  a JOIN b ON p >= s AND p < s + C [AND other predicates]  }}}
  *
  * (no equi conjunct, Long point `p` from one side, Long start `s` from
  * the other, literal C > 0; `<=` bounds and flipped comparison spellings
  * accepted) plans as a BroadcastNestedLoopJoin — N·M comparisons. This
  * rule rewrites it into the binned equi-join `join_interval_binned`
  * spells by hand: because the interval length is bounded by C, binning
  * both sides at width C means every qualifying (interval, point) pair
  * shares either the interval's bin or its +1 neighbor — the interval
  * side explodes to those ≤2 bins, the point side gets its one bin, the
  * join keys on the bin, and the ORIGINAL predicates re-applied on top
  * discard bin false positives. Shuffle cost 2·N + M rows instead of N·M
  * comparisons; the validity-window/session/promo-attribution join users
  * write declaratively.
  *
  * Correctness: floor((s+C)/C) == floor(s/C) + 1 exactly (C > 0), so a
  * point p in [s, s+C] always lands in {bin(s), bin(s)+1}; the exploded
  * bins are distinct (array_distinct guards the width-1 clamp corner), so
  * a pair joins at most once. Null keys produce null bins which never
  * satisfy the equi-join — matching the BNLJ, where the null comparison
  * filters the row. Bin arithmetic is the wrap-safe [[BinnedJoins]] form.
  *
  * Conservative by construction: Inner joins only, batch only, LongType
  * only, literal bound only, and never when ANY equi conjunct exists.
  */
object RewriteIntervalJoin extends Rule[LogicalPlan] with PredicateHelper {
  import BinnedJoins._

  /** (point, start, width): matched from a lower conjunct `p >= s` (or
    * `p > s`-less strictly we accept only >=/<= spellings) paired with an
    * upper conjunct `p < s' + C` where s' is semantically s.
    */
  private def intervalConjuncts(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Long)] = {
    def longPair(a: Expression, b: Expression): Boolean =
      a.deterministic && b.deterministic &&
        a.dataType == LongType && b.dataType == LongType
    // lower bounds: p >= s in either spelling
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(p, s) if longPair(p, s) => (p, s)
      case LessThanOrEqual(s, p) if longPair(p, s) => (p, s)
    }
    // upper bounds: p < s + C / p <= s + C in either spelling and either
    // Add operand order (canonicalization may reorder literals)
    def plusLit(e: Expression): Option[(Expression, Long)] = e match {
      case Add(s, Literal(c: Long, LongType), _) => Some((s, c))
      case Add(Literal(c: Long, LongType), s, _) => Some((s, c))
      case _ => None
    }
    val uppers = conjuncts.flatMap {
      case LessThan(p, e) => plusLit(e).map { case (s, c) => (p, s, c) }
      case LessThanOrEqual(p, e) => plusLit(e).map { case (s, c) => (p, s, c) }
      case GreaterThan(e, p) => plusLit(e).map { case (s, c) => (p, s, c) }
      case GreaterThanOrEqual(e, p) => plusLit(e).map { case (s, c) => (p, s, c) }
      case _ => None
    }.filter { case (p, s, c) => longPair(p, s) && c > 0 }
    val matched = for {
      (pl, sl) <- lowers
      (pu, su, c) <- uppers
      if pl.semanticEquals(pu) && sl.semanticEquals(su)
      // p and s must come from opposite sides
      if (canEvaluate(pl, left) && canEvaluate(sl, right)) ||
        (canEvaluate(pl, right) && canEvaluate(sl, left))
    } yield (pl, sl, c)
    matched.headOption
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && !j.isStreaming =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasEquiConjunct(conjuncts, left, right)) j
      else intervalConjuncts(conjuncts, left, right) match {
        case None => j
        case Some((p, s, width)) =>
          val intervalOnLeft = canEvaluate(s, left)
          val (ivSide, ptSide) = if (intervalOnLeft) (left, right)
                                 else (right, left)
          // interval side: bin(s) once in a Project, explode to its bin
          // and the +1 neighbor (clamped; distinct)
          val binSAlias = Alias(bin(s, width), "_graft_ivbin_s")()
          val projIv = Project(ivSide.output :+ binSAlias, ivSide)
          val b = binSAlias.toAttribute
          val genOut = AttributeReference("_graft_ivbin", LongType)()
          val gen = Generate(
            Explode(ArrayDistinct(CreateArray(Seq(b, clampedHi(b))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(genOut), child = projIv)
          // point side: its single bin
          val binPAlias = Alias(bin(p, width), "_graft_ivbin_p")()
          val projPt = Project(ptSide.output :+ binPAlias, ptSide)
          val joined = conjuncts.foldLeft[Expression](
            EqualTo(genOut, binPAlias.toAttribute))(
            (acc, c) => org.apache.spark.sql.catalyst.expressions.And(acc, c))
          val (newLeft, newRight) = if (intervalOnLeft) (gen, projPt)
                                    else (projPt, gen)
          Project(left.output ++ right.output,
            Join(newLeft, newRight, Inner, Some(joined), hint))
      }
  }
}
