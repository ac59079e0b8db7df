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

  /** NEAREST as-of join: for each left row, the right row minimizing
    * |rightTime − leftTime| in the same key group, searching BOTH
    * directions — sensor/tick alignment semantics ("the closest reading"),
    * where backward-only would systematically bias toward stale matches.
    * Ties between an equally-near earlier and later candidate resolve
    * BACKWARD (the point-in-time-safe side); a right row at exactly
    * leftTime is a backward match with distance 0.
    *
    * Same cost profile as [[backward]]: one union, ONE key-shuffled sort
    * (both frames share the (key | time, side) order, so physical planning
    * runs them in a single Window pass), linear per key, no
    * range-explosion. Time columns must be numeric (e.g. unix micros) —
    * the distance is computed by subtraction.
    *
    * Appends `asof_dt` (the |Δtime| of the match) and `asof_dir`
    * ('backward' | 'forward') to the carried right columns. */
  def nearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
              leftTime: String, rightTime: String, rightCols: Seq[String],
              rightTiebreak: Option[String] = None,
              joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"unsupported joinType $joinType")
    val leftOut = left.columns.toSeq
    val key = keyCols.map(col)
    val rDeduped = rightTiebreak match {
      case Some(tb) =>
        val w = Window.partitionBy((keyCols :+ rightTime).map(col): _*)
          .orderBy(col(tb).desc)
        right.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
      case None => right
    }
    val rStructType =
      struct(rightCols.map(col) :+ col(rightTime).as("__rt"): _*)
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
    // right rows sort before left at equal time → an exact-time right row
    // lands in the PRECEDING frame: visible, backward, distance 0
    val ord = Window.partitionBy(key: _*).orderBy(col("__t").asc, col("__side"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val picked = lTagged.unionByName(rTagged)
      .withColumn("__b", last(col("__r"), ignoreNulls = true).over(wb))
      .withColumn("__f", first(col("__r"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
      .withColumn("__dtb", col("__t") - col("__b.__rt"))
      .withColumn("__dtf", col("__f.__rt") - col("__t"))
      .withColumn("__pb", col("__b").isNotNull &&
        (col("__f").isNull || col("__dtb") <= col("__dtf")))
      .withColumn("__pick", when(col("__pb"), col("__b")).otherwise(col("__f")))
    val filtered =
      if (joinType == "inner") picked.filter(col("__pick").isNotNull) else picked
    filtered.select(
      leftOut.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__pick.$c").as(c)) ++ Seq(
          when(col("__pick").isNotNull,
            when(col("__pb"), col("__dtb")).otherwise(col("__dtf"))).as("asof_dt"),
          when(col("__pick").isNotNull,
            when(col("__pb"), lit("backward")).otherwise(lit("forward")))
            .as("asof_dir")): _*)
  }

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
