package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{
  And, ArrayDistinct, AttributeReference, Concat, CreateArray, ElementAt,
  Expression, GreaterThanOrEqual, If, IsNull, Literal, Size, Slice, SortArray}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `mink_distinct(x, k)` — bounded DISTINCT min-k AGGREGATE: the k smallest
  * distinct values of a long column per group, as an ascending array.
  *
  * This is the state of a KMV (k-minimum-values / bottom-k) cardinality
  * sketch [[graft.ops.Sketches]]: keep the k smallest distinct hash values
  * ever seen and the k-th one estimates the distinct count — and, unlike
  * HLL registers, the RETAINED VALUES support sketch-side set operations
  * (intersection / Jaccard between two sketches), which min-merged
  * registers cannot answer.
  *
  * Scale contract, same family as [[TopKDoubles]]: the aggregation buffer
  * never exceeds k elements on either the partial (map-side) or final side,
  * so the exchange carries ONE ≤ k-element array per partition — constant
  * in both corpus size and key cardinality. The naive
  * `slice(array_sort(collect_set(x)), 1, k)` holds every distinct key in
  * the buffer (cardinality-sized state, the exact cost a cardinality
  * sketch exists to avoid).
  *
  * Update fast path: once the buffer is saturated (size = k), a value ≥ the
  * current k-th smallest cannot enter the sketch and is rejected in O(1) —
  * no concat/sort — which is the common case for almost every row once the
  * sketch fills. Merge is distinct-union-then-min-k: associative,
  * commutative, and IDEMPOTENT (re-merging the same partial is a no-op,
  * like HLL min-merge and unlike CMS sum-merge), so the result is
  * partitioning- and replay-independent.
  *
  * `k` must be a foldable positive integer. Nulls are skipped on update.
  */
case class MinKDistinctLongs(left: Expression, right: Expression)
  extends DeclarativeAggregate
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"mink_distinct: value must be BIGINT, got ${left.dataType.simpleString}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("mink_distinct: k must be a literal INT")
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "mink_distinct"

  private def k: Expression = {
    require(right.foldable, "mink_distinct: k must be a literal")
    right
  }

  private lazy val buf = AttributeReference(
    "mink_buf", ArrayType(LongType, containsNull = false), nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(buf)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))

  private def mergedMinK(a: Expression, b: Expression): Expression =
    Slice(new SortArray(ArrayDistinct(Concat(Seq(a, b))), Literal(true)),
      Literal(1), k)

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(left), buf,
      // saturated buffer + value not below the current k-th smallest →
      // cannot enter; And short-circuits, so ElementAt(buf, k) only
      // evaluates when size(buf) = k
      If(And(GreaterThanOrEqual(Size(buf), k),
             GreaterThanOrEqual(left, ElementAt(buf, k))),
        buf,
        mergedMinK(buf, CreateArray(Seq(left))))))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    mergedMinK(buf.left, buf.right))

  override lazy val evaluateExpression: Expression = buf

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinKAggregate {
  /** Column entry point: k smallest distinct values of a long column,
    * ascending. */
  def minkDistinct(c: Column, k: Int): Column =
    GraftBridge.column(
      MinKDistinctLongs(GraftBridge.expression(c), Literal(k)).toAggregateExpression())
}
