package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the most recent right row with
  * `rightTime <= leftTime` in the same key group — the point-in-time-correct
  * feature lookup ("the feature value as of this event"), which a keyed
  * feature store like the reference's needs for leak-free training joins.
  *
  * Spark has no asof operator; this composes built-ins (preference (a) of
  * the build rules): tag both sides, union, and run `last(_, ignoreNulls)`
  * over a per-key time-ordered window. One shuffle on the key, then a
  * linear per-key pass — the same cost profile as a sort-merge join, with
  * no range-explosion (a naive `l.t >= r.t` theta-join is quadratic per key).
  *
  * Ties: a right row at exactly leftTime is visible (<=). Right-side
  * duplicates at the same (key, time) are resolved by `rightTiebreak`
  * (highest wins) so results are deterministic.
  */
object AsOfJoin {

  /** @param rightCols right columns to carry (besides key/time)
    * @param joinType  "inner" drops left rows with no match; "left" keeps
    *                  them with nulls */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String, rightCols: Seq[String],
               rightTiebreak: Option[String] = None,
               joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"unsupported joinType $joinType")
    val leftOut = left.columns.toSeq
    val key = keyCols.map(col)

    // common shape: keys ++ __t ++ __side ++ left-struct ++ right payloads
    val lTagged = left.select(
      key ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        struct(leftOut.map(col): _*).as("__l")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val rDeduped = rightTiebreak match {
      case Some(tb) =>
        val w = Window.partitionBy((keyCols :+ rightTime).map(col): _*)
          .orderBy(col(tb).desc)
        right.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
      case None => right
    }
    val rTagged = rDeduped.select(
      key ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(lTagged.schema("__l").dataType).as("__l")) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)

    // right rows sort before left rows at equal time → <= visibility
    val w = Window.partitionBy(key: _*).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__matched", last(when(col("__side") === 0, lit(1)), ignoreNulls = true).over(w))
    val withPayload = rightCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"__last_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    val leftRows = withPayload.filter(col("__side") === 1)
    val filtered = if (joinType == "inner") leftRows.filter(col("__matched") === 1) else leftRows
    filtered.select(
      leftOut.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__last_$c").as(c)): _*)
  }
}
