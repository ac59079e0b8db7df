package graft.monitor

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A9 — the reference's CloudWatch alarm semantics: Maximum statistic over
  * 1-hour periods, alarm after k consecutive periods ≥ threshold
  * (ref: pipeline-modelmonitor-code/model-monitor-template.yml:766-796;
  * k default 3, model-build-params.json:20).
  */
object Alarm {

  /** Bucket a metric stream into hourly maxima and flag k-consecutive
    * breaches. Output: one row per hour with `hour_start`, `hourly_max`,
    * `breached` (0/1), `alarm` (1 when this hour completes ≥k consecutive
    * breaches).
    *
    * Scale notes: the hourly rollup is a keyed groupBy (shuffles on the hour
    * key, partial-agg'd map-side). The consecutive check is a frame of k rows
    * over the hour ordering — a single ordered window, fine for metric-series
    * cardinality (8760 rows/year); per-metric streams should partition the
    * window by metric id. */
  def consecutiveBreaches(metrics: DataFrame, tsCol: String, valueCol: String,
                          threshold: Double, k: Int = 3): DataFrame = {
    val hourly = metrics
      .groupBy(date_format(date_trunc("hour", col(tsCol)), "yyyy-MM-dd HH:00:00").as("hour_start"))
      .agg(max(col(valueCol)).as("hourly_max"))
      .withColumn("breached", (col("hourly_max") >= threshold).cast("int"))
    // global window over the HOURLY spine (≤ 8.8k rows/year) — metadata
    val w = Window.partitionBy().orderBy(col("hour_start")).rowsBetween(-(k - 1), 0)
    hourly.withColumn(
      "alarm",
      (min(col("breached")).over(w) === 1 && count(lit(1)).over(w) === k).cast("int"))
  }
}

/** Threshold feedback loop (ref: update_monitoring_threshold.py:66-101): after
  * a model is approved, if the new wQL beat the current threshold, tighten:
  * new = wql + |wql - threshold| * updateRate (default rate 0.5,
  * model-build-params.json:22). */
object ThresholdUpdate {
  def next(wql: Double, threshold: Double, updateRate: Double = 0.5): Double =
    if (wql < threshold) wql + math.abs(wql - threshold) * updateRate else threshold

  /** Columnar form of [[next]] — the same compare-and-tighten expressed
    * relationally so the feedback step can run inside a query (J3). */
  def nextCol(wql: Column, threshold: Column, updateRate: Column): Column =
    when(wql < threshold, wql + abs(wql - threshold) * updateRate)
      .otherwise(threshold)
}
