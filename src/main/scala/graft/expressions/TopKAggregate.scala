package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, Concat, CreateArray, Expression, If, IsNull, Literal,
  Slice, SortArray}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `topk_vals(x, k)` — bounded top-k AGGREGATE: the k largest values of a
  * double column per group, as a descending array.
  *
  * The point versus `slice(sort_array(collect_list(x)), 1, k)` is the
  * BUFFER BOUND: collect_list holds every group value in the aggregation
  * buffer (group-sized state, the thing that OOMs a hot group at 100 TB
  * and is disallowed in streaming state), while this buffer never exceeds
  * k elements on either the partial (map-side) or final side — the
  * aggregate-form counterpart of o9's window top-k, safe for hot keys and
  * usable under partial aggregation everywhere.
  *
  * Implementation is a [[DeclarativeAggregate]] — update and merge are
  * ordinary Catalyst expressions (concat → sort desc → slice k), so the
  * whole aggregate stays inside codegen'd expression evaluation with no
  * imperative buffer class; merge is associative/commutative by
  * construction (multiset union then top-k), making the result
  * partitioning-independent. Engine-surface demo of the third Catalyst
  * tier (custom aggregate function) beside the scalar expression
  * (cosine_sim) and wordGrams tiers.
  *
  * `k` must be a foldable positive integer. Nulls are skipped on update.
  */
case class TopKDoubles(left: Expression, right: Expression)
  extends DeclarativeAggregate
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_vals: value must be DOUBLE, got ${left.dataType.simpleString}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("topk_vals: k must be a literal INT")
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "topk_vals"

  private def k: Expression = {
    require(right.foldable, "topk_vals: k must be a literal")
    right
  }

  private lazy val buf = AttributeReference(
    "topk_buf", ArrayType(DoubleType, containsNull = false), nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(buf)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(Array.empty[Double], ArrayType(DoubleType, containsNull = false)))

  private def mergedTopK(a: Expression, b: Expression): Expression =
    Slice(new SortArray(Concat(Seq(a, b)), Literal(false)), Literal(1), k)

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(left), buf, mergedTopK(buf, CreateArray(Seq(left)))))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    mergedTopK(buf.left, buf.right))

  override lazy val evaluateExpression: Expression = buf

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TopKAggregate {
  /** Column entry point: top-k values of a double column, descending. */
  def topkVals(c: Column, k: Int): Column =
    GraftBridge.column(
      TopKDoubles(GraftBridge.expression(c), Literal(k)).toAggregateExpression())
}
