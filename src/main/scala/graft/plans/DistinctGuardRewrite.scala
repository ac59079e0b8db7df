package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, AttributeReference, EqualNullSafe, EqualTo, ExprId, Expression,
  GreaterThan, GreaterThanOrEqual, IsNotNull, IsNull, LessThan,
  LessThanOrEqual, Literal, NamedExpression, Not, RowOrdering}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite COUNT(DISTINCT x) used ONLY as a small-cardinality
  * guard into min/max comparisons.
  *
  * The idiom — `HAVING COUNT(DISTINCT x) > 1` (skew/conflict detection,
  * multi-supplier orders, key-collision audits) or `= 1` (uniqueness
  * admission) — never needs the count: it asks a yes/no question about
  * whether a group's non-null values are absent / all-equal / not-all-equal,
  * and min(x)/max(x) answer it exactly:
  *
  *   COUNT(DISTINCT x) >  1  ⟺  NOT (min(x) <=> max(x))
  *   COUNT(DISTINCT x) =  1  ⟺  min(x) IS NOT NULL AND min(x) = max(x)
  *   COUNT(DISTINCT x) <= 1  ⟺  min(x) <=> max(x)
  *   COUNT(DISTINCT x) >  0  ⟺  min(x) IS NOT NULL
  *   COUNT(DISTINCT x) =  0  ⟺  min(x) IS NULL
  *
  * (min/max ignore nulls, exactly like DISTINCT counting.) Every replacement
  * is TWO-VALUED — never NULL — because COUNT itself is never null, so the
  * original guard is two-valued. This matters under negation: the guard may
  * sit anywhere in the filter tree (e.g. `HAVING COUNT(DISTINCT x) <> 1`
  * parses to Not(EqualTo)), and a bare EqualTo(min,max) would be NULL for
  * an all-null group — Not(NULL)=NULL drops the group where the original
  * Not(0=1)=TRUE keeps it. Hence the IsNotNull conjunct on the `= 1` form.
  *
  * Why it matters at 100 TB: Spark plans a distinct aggregate as an Expand
  * over (group, x) — a second full-width shuffle keyed by the distinct
  * column — while min/max stay inside the ONE hash aggregate the query
  * already pays for, partial-aggregated map-side. This is the q28 lesson
  * (multi-supplier = min(sk) ≠ max(sk)) promoted from a hand-applied
  * rewrite to an automatic Rule[LogicalPlan].
  *
  * Fires only when provably equivalent:
  *   - the shape is Project(Filter(cond, Aggregate)) and the count alias is
  *     referenced NOWHERE except in recognized comparisons inside cond (if
  *     the count value escapes — projected out, compared against any other
  *     bound — the rule declines);
  *   - COUNT is DISTINCT over a single deterministic orderable child, with
  *     no FILTER clause;
  *   - the comparison bound is a recognized integer literal form above
  *     (either operand order).
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftExtensions]]), beside [[BoundedTopKRewrite]].
  */
object DistinctGuardRewrite extends Rule[LogicalPlan] {

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Int, _) => Some(v.toLong)
    case Literal(v: Long, _) => Some(v)
    case Literal(v: Short, _) => Some(v.toLong)
    case Literal(v: Byte, _) => Some(v.toLong)
    case _ => None
  }

  /** Recognized guard shapes on the count attribute `id`, normalized to a
    * predicate over (mn, mx). Returns None for any other use of `id`. */
  private def guardOf(e: Expression, id: ExprId,
      mn: AttributeReference, mx: AttributeReference): Option[Expression] = {
    def isAttr(x: Expression) = x match {
      case ar: AttributeReference => ar.exprId == id
      case _ => false
    }
    e match {
      // count >= 2-style: not-all-equal (null-safe — all-null group drops)
      case GreaterThan(a, l) if isAttr(a) && litLong(l).contains(1L) =>
        Some(Not(EqualNullSafe(mn, mx)))
      case GreaterThanOrEqual(a, l) if isAttr(a) && litLong(l).contains(2L) =>
        Some(Not(EqualNullSafe(mn, mx)))
      case LessThan(l, a) if isAttr(a) && litLong(l).contains(1L) =>
        Some(Not(EqualNullSafe(mn, mx)))
      case LessThanOrEqual(l, a) if isAttr(a) && litLong(l).contains(2L) =>
        Some(Not(EqualNullSafe(mn, mx)))
      // count = 1: exactly one distinct non-null. Two-valued on purpose:
      // an all-null group gives EqualTo(null,null)=NULL, and under Not(...)
      // (count <> 1) NULL would wrongly drop the group — the IsNotNull
      // conjunct forces FALSE there, matching COUNT's never-null semantics.
      case EqualTo(a, l) if isAttr(a) && litLong(l).contains(1L) =>
        Some(And(IsNotNull(mn), EqualTo(mn, mx)))
      case EqualTo(l, a) if isAttr(a) && litLong(l).contains(1L) =>
        Some(And(IsNotNull(mn), EqualTo(mn, mx)))
      // count <= 1: zero-or-one distinct
      case LessThanOrEqual(a, l) if isAttr(a) && litLong(l).contains(1L) =>
        Some(EqualNullSafe(mn, mx))
      case LessThan(a, l) if isAttr(a) && litLong(l).contains(2L) =>
        Some(EqualNullSafe(mn, mx))
      // count > 0 / count = 0: any non-null at all
      case GreaterThan(a, l) if isAttr(a) && litLong(l).contains(0L) =>
        Some(IsNotNull(mn))
      case GreaterThanOrEqual(a, l) if isAttr(a) && litLong(l).contains(1L) =>
        Some(IsNotNull(mn))
      case EqualTo(a, l) if isAttr(a) && litLong(l).contains(0L) =>
        Some(IsNull(mn))
      case EqualTo(l, a) if isAttr(a) && litLong(l).contains(0L) =>
        Some(IsNull(mn))
      case _ => None
    }
  }

  private def refCount(e: Expression, id: ExprId): Int =
    e.collect { case ar: AttributeReference if ar.exprId == id => ar }.size

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(plist, Filter(cond, agg: Aggregate)) =>
      // candidate COUNT(DISTINCT x) aliases: single deterministic orderable
      // child, no FILTER clause
      val candidates = agg.aggregateExpressions.collect {
        case a @ Alias(
            AggregateExpression(Count(Seq(x)), _, true, None, _), _)
            if x.deterministic && RowOrdering.isOrderable(x.dataType) =>
          a.exprId -> ((a, x))
      }.toMap
      if (candidates.isEmpty) p
      else {
        var newAggExprs = agg.aggregateExpressions
        var newCond = cond
        var fired = false
        candidates.foreach { case (id, (alias, x)) =>
          val escapes = plist.map(refCount(_, id)).sum > 0
          if (!escapes) {
            val mnAlias = Alias(
              Min(x).toAggregateExpression(), alias.name + "_mn")()
            val mxAlias = Alias(
              Max(x).toAggregateExpression(), alias.name + "_mx")()
            val mn = mnAlias.toAttribute.asInstanceOf[AttributeReference]
            val mx = mxAlias.toAttribute.asInstanceOf[AttributeReference]
            var matched = 0
            val rewritten = newCond.transformUp {
              case e: Expression if guardOf(e, id, mn, mx).isDefined =>
                matched += 1
                guardOf(e, id, mn, mx).get
            }
            // equivalence requires EVERY reference to be a recognized guard
            if (matched > 0 && refCount(rewritten, id) == 0) {
              newCond = rewritten
              newAggExprs = newAggExprs.filterNot {
                case a: Alias => a.exprId == id
                case _ => false
              } ++ Seq(mnAlias, mxAlias)
              fired = true
            }
          }
        }
        if (!fired) p
        else Project(plist,
          Filter(newCond, agg.copy(aggregateExpressions = newAggExprs)))
      }
  }
}
