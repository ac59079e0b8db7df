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
               joinType: String = "inner"): DataFrame =
    asof(left, right, keyCols, leftTime, rightTime, rightCols, rightTiebreak,
      joinType, forwardDir = false)

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` in the same key group — the "next event"
    * lookup (next price tick, next maintenance window, time-to-next-error
    * labels). Same union-window composition as [[backward]] traversed in
    * reverse time order; same cost profile (one shuffle on the key, linear
    * per-key pass, no range-explosion). A right row at exactly leftTime is
    * visible (>=); same-(key,time) right duplicates resolve by
    * `rightTiebreak` (highest wins), matching backward. */
  def forward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
              leftTime: String, rightTime: String, rightCols: Seq[String],
              rightTiebreak: Option[String] = None,
              joinType: String = "inner"): DataFrame =
    asof(left, right, keyCols, leftTime, rightTime, rightCols, rightTiebreak,
      joinType, forwardDir = true)

  private def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTime: String, rightTime: String, rightCols: Seq[String],
                   rightTiebreak: Option[String],
                   joinType: String, forwardDir: Boolean): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"unsupported joinType $joinType")
    val leftOut = left.columns.toSeq
    val key = keyCols.map(col)

    // common shape: keys ++ __t ++ __side ++ left-struct ++ right-struct.
    // The right payload rides as ONE struct so a legitimately NULL payload
    // field is preserved (a per-column last(ignoreNulls) would skip it and
    // surface a stale older value, or stitch fields from different rows).
    val rDeduped = rightTiebreak match {
      case Some(tb) =>
        val w = Window.partitionBy((keyCols :+ rightTime).map(col): _*)
          .orderBy(col(tb).desc)
        right.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
      case None => right
    }
    val rStructType = org.apache.spark.sql.functions.struct(rightCols.map(col): _*)
    val lTagged = left.select(
      key ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        struct(leftOut.map(col): _*).as("__l"),
        lit(null).cast(rDeduped.select(rStructType).schema.head.dataType).as("__r")): _*)
    val rTagged = rDeduped.select(
      key ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(lTagged.schema("__l").dataType).as("__l"),
        rStructType.as("__r")): _*)

    // right rows sort before left rows at equal time → <=/>= visibility;
    // forward traverses time DESCENDING, so "last right seen" is the
    // earliest right row at-or-after the left row
    val timeOrder = if (forwardDir) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(key: _*).orderBy(timeOrder, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__last_r", last(col("__r"), ignoreNulls = true).over(w))
    val leftRows = carried.filter(col("__side") === 1)
    val filtered =
      if (joinType == "inner") leftRows.filter(col("__last_r").isNotNull) else leftRows
    filtered.select(
      leftOut.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__last_r.$c").as(c)): _*)
  }
}
