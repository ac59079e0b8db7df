package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, ArraySort, AttributeReference, Expression, Literal, NamedExpression,
  Reverse, Slice, SortArray}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, CollectList}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}

import graft.expressions.TopKDoubles

/** Optimizer rule: rewrite the group-sized-buffer top-k idiom
  *
  *   slice(sort_array(collect_list(x), false), 1, k)
  *   slice(reverse(array_sort(collect_list(x))), 1, k)
  *
  * into the bounded-buffer [[TopKDoubles]] aggregate. The idiom is what
  * users naturally write, and it is a scale hazard hiding in plain sight:
  * collect_list buffers EVERY group value on both aggregation sides, so
  * one hot key OOMs an executor at 100 TB — while the result only ever
  * needs k elements. The rewrite makes the safe form automatic instead of
  * something the user must know to ask for (`topk_vals`).
  *
  * Fires only when it is provably equivalent:
  *   - the collected column is DOUBLE (TopKDoubles' domain),
  *   - k is a positive integer literal and the slice starts at 1,
  *   - collect_list is not DISTINCT and carries no FILTER,
  *   - EVERY reference to the collected list in the parent Project is one
  *     of the matching slice patterns with the same k — if the raw list
  *     escapes anywhere, the rewrite would change observable results, so
  *     it declines.
  *
  * Null handling already agrees (collect_list skips nulls; so does the
  * TopKDoubles update). The only observable schema change is element
  * nullability narrowing (containsNull true → false), which is safe.
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftExtensions]]) — the engine's Rule[LogicalPlan] tier
  * beside its scalar/aggregate expression tiers.
  */
object BoundedTopKRewrite extends Rule[LogicalPlan] {

  /** The slice-of-descending-sort shapes over an attribute; returns k. */
  private def sliceTopK(e: Expression): Option[(AttributeReference, Int)] = e match {
    case Slice(SortArray(attr: AttributeReference, Literal(false, _)),
        Literal(1, IntegerType), Literal(k: Int, IntegerType)) if k > 0 =>
      Some((attr, k))
    case Slice(Reverse(ArraySort(attr: AttributeReference, _, _)),
        Literal(1, IntegerType), Literal(k: Int, IntegerType)) if k > 0 =>
      Some((attr, k))
    case _ => None
  }

  /** The collapsed form (CollapseProject folds the slice into the
    * Aggregate's own output list): the collect_list sits INSIDE the slice
    * expression, so there is no escape to analyze — rewrite in place. */
  private def rewriteInline(e: Expression): Expression = e.transformUp {
    case Slice(SortArray(
          AggregateExpression(CollectList(child, _, _), _, false, None, _),
          Literal(false, _)),
        Literal(1, IntegerType), Literal(k: Int, IntegerType))
        if k > 0 && child.dataType == DoubleType =>
      TopKDoubles(child, Literal(k)).toAggregateExpression()
    case Slice(Reverse(ArraySort(
          AggregateExpression(CollectList(child, _, _), _, false, None, _), _, _)),
        Literal(1, IntegerType), Literal(k: Int, IntegerType))
        if k > 0 && child.dataType == DoubleType =>
      TopKDoubles(child, Literal(k)).toAggregateExpression()
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate
        if agg.aggregateExpressions.exists(ne => rewriteInline(ne) ne ne) =>
      agg.copy(aggregateExpressions = agg.aggregateExpressions
        .map(ne => rewriteInline(ne).asInstanceOf[NamedExpression]))
    case p @ Project(projectList, agg: Aggregate) =>
      // candidate collect_list aliases over DOUBLE, plain (no distinct/filter)
      val candidates = agg.aggregateExpressions.collect {
        case a @ Alias(AggregateExpression(CollectList(child, _, _), _, false, None, _), _)
            if child.dataType == DoubleType =>
          a.exprId -> ((a, child))
      }.toMap
      if (candidates.isEmpty) p
      else {
        // per candidate: every reference in the project must be a matching
        // slice pattern, and all patterns must agree on k
        val matched = candidates.flatMap { case (id, (alias, child)) =>
          val refs = projectList.map(_.collect {
            case ar: AttributeReference if ar.exprId == id => ar
          }.size).sum
          val ks = projectList.flatMap(_.collect {
            case e if sliceTopK(e).exists(_._1.exprId == id) => sliceTopK(e).get._2
          })
          if (refs > 0 && refs == ks.size && ks.distinct.size == 1)
            Some(id -> ((alias, child, ks.head)))
          else None
        }
        if (matched.isEmpty) p
        else {
          val newAliases = matched.map { case (id, (alias, child, k)) =>
            id -> Alias(
              TopKDoubles(child, Literal(k)).toAggregateExpression(),
              alias.name + "_topk")()
          }
          val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
            case a: Alias if newAliases.contains(a.exprId) => newAliases(a.exprId)
            case other => other
          }
          val newProjectList = projectList.map(_.transformUp {
            case e: Expression =>
              sliceTopK(e) match {
                case Some((attr, _)) if newAliases.contains(attr.exprId) =>
                  newAliases(attr.exprId).toAttribute
                case _ => e
              }
          }.asInstanceOf[NamedExpression])
          Project(newProjectList, agg.copy(aggregateExpressions = newAggExprs))
        }
      }
  }
}
