package graft.monitor

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.batch.{Evaluation, Forecaster, QuantileBounds, SeriesETL}

/** The hourly monitoring pipeline (ref: pipeline-modelmonitor-code/
  * monitoring_data_collection.py + custom_monitoring_metrics.py): read the
  * aggregate series, hold out the last `predictionLength` points as ground
  * truth, forecast them from the prefix, compute RMSE + mean weighted
  * quantile loss, and append a metrics row. The alarm query
  * ([[Alarm.consecutiveBreaches]]) then decides retraining.
  */
object MonitoringJob {

  case class Metrics(rmse: Double, wql: Seq[(Double, Double)], meanWql: Double,
                     n: Long, threshold: Double, breached: Boolean)

  /** @param agg        aggregate table (latest-wins view)
    * @param orderCol   time key, ascending (e.g. tx_minute)
    * @param targetCol  metric column (reference: avg_fee_1min)
    * @param confidence monitoring confidence (whitelist {60,70,80,90})
    * @param maxHistory cap on the context window collected for the
    *                   forecaster (default: one year of minutes) — the
    *                   driver transfer stays bounded however old the table
    *                   grows; the Forecaster contract takes a driver-side
    *                   array because it mirrors the reference's endpoint call
    * @param artifactDir when set, renders targets-quantiles.csv +
    *                   evaluation.json and the capture-format JSONL pairs
    *                   under this directory (see [[EvaluationReport]] /
    *                   [[MonitoringCapture]])
    * @param uploadTime  timestamp used for capture paths + inferenceTime */
  def run(agg: DataFrame, orderCol: String, targetCol: String,
          forecaster: Forecaster, threshold: Double,
          predictionLength: Int = 5, confidence: Int = 90,
          maxHistory: Long = 527040L,
          artifactDir: Option[String] = None,
          uploadTime: java.time.Instant = java.time.Instant.EPOCH)
         (implicit spark: SparkSession): Metrics = {
    import spark.implicits._
    val n = agg.count()
    require(n > predictionLength,
      s"monitoring needs more than predictionLength=$predictionLength rows, got $n")
    val idx = SeriesETL.indexed(agg, orderCol).cache()
    try {
      val p = predictionLength.toLong
      // capped context window ending at the forecast origin drives the
      // forecast; tail is ground truth (monitoring_data_collection.py:154-176)
      val hist = SeriesETL.toSeries(
        SeriesETL.range(idx, math.max(0L, n - p - maxHistory), n - p),
        orderCol, targetCol).head()
      val truth = SeriesETL.tail(idx, p).orderBy(orderCol)
        .select(col(targetCol).cast("double")).as[Double].collect()

      val (lowQ, upQ) = QuantileBounds.monitoring(confidence)
      val quantiles = Seq(lowQ, 0.5, upQ)
      val (mean, qPreds) = forecaster.predict(hist.target, truth.length, quantiles)

      // J2 positional align of truth vs predictions
      val aligned = truth.indices.map { i =>
        (i + 1, truth(i), mean(i), qPreds(lowQ)(i), qPreds(0.5)(i), qPreds(upQ)(i))
      }.toDF("__pos", "target", "prediction_mean", "pred_low", "pred_mid", "pred_up")

      val rmse = Evaluation.rmse(aligned, "target", "prediction_mean")
      val (perQ, meanWql) = Evaluation.weightedQuantileLoss(aligned, "target",
        Seq(lowQ -> "pred_low", 0.5 -> "pred_mid", upQ -> "pred_up"))
      artifactDir.foreach { dir =>
        EvaluationReport.write(aligned, "__pos", dir, lowQ, upQ, rmse, meanWql)
        MonitoringCapture.write(hist.start, hist.target.toSeq,
          qPreds(0.5).toSeq, truth.toSeq, dir, uploadTime)
      }
      Metrics(rmse, perQ, meanWql, truth.length, threshold, meanWql >= threshold)
    } finally idx.unpersist()
  }

  /** Append a metrics row to the monitoring table (the CloudWatch
    * put_metric_data analog, custom_monitoring_metrics.py:189-210). */
  def record(m: Metrics, tsEpochSec: Long, path: String)
            (implicit spark: SparkSession): Unit = {
    import spark.implicits._
    Seq((tsEpochSec, m.rmse, m.meanWql, m.threshold, m.breached))
      .toDF("ts_epoch", "rmse", "mean_wql", "threshold", "breached")
      .write.mode("append").parquet(path)
  }
}
