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
          qPreds(0.5).toSeq, truth.toSeq, dir, uploadTime,
          aligned.sparkSession.sparkContext.hadoopConfiguration)
      }
      Metrics(rmse, perQ, meanWql, truth.length, threshold, meanWql >= threshold)
    } finally idx.unpersist()
  }

  /** One fleet-metrics row per monitored series. */
  case class SeriesMetrics(series: String, rmse: Double, meanWql: Double,
                           n: Long, threshold: Double, breached: Boolean)

  /** Fleet variant: monitor MANY series in one distributed pass — one
    * metrics row per series key, the forecaster invoked per key on the
    * EXECUTORS (the single-series [[run]] mirrors the reference's one
    * driver-side endpoint call; a fleet of metrics must not serialize
    * through the driver).
    *
    * Scale shape: `groupByKey(series).flatMapSortedGroups(order)` — one
    * shuffle on the series key; within each group the sorted iterator is
    * folded into a RING BUFFER of `maxHistory + predictionLength` doubles,
    * so per-key executor state is bounded no matter how long a series
    * grows, and series of wildly different lengths skew only by their
    * capped window. Metric math mirrors [[Evaluation]] exactly (pinball,
    * weight = 2/Σ|target|, mean over quantiles); the per-group sums run
    * over the sorted window, so results are deterministic.
    *
    * Series shorter than `predictionLength + 1` rows can't be scored and
    * surface as NaN metrics with `n = 0` (not silently dropped — a fleet
    * dashboard must see dead series). */
  def runFleet(agg: DataFrame, seriesCol: String, orderCol: String,
               targetCol: String, forecaster: Forecaster, threshold: Double,
               predictionLength: Int = 5, confidence: Int = 90,
               maxHistory: Long = 527040L)
              (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val (lowQ, upQ) = QuantileBounds.monitoring(confidence)
    val quantiles = Seq(lowQ, 0.5, upQ)
    val p = predictionLength
    val cap = (maxHistory + p).min(Int.MaxValue.toLong).toInt

    agg.select(col(seriesCol).cast("string").as("__series"),
        // ordering uses the column's NATIVE type — a string cast would
        // sort numeric order keys lexicographically and silently score the
        // wrong forecast window
        col(orderCol).as("__ord"),
        col(targetCol).cast("double").as("__target"))
      .groupByKey(_.getString(0))(org.apache.spark.sql.Encoders.STRING)
      .flatMapSortedGroups(col("__ord")) { (series, rows) =>
        // last `cap` values of the sorted series: ring buffer grown on
        // demand (a fleet of short series must not pay the full maxHistory
        // allocation per key), bounded by cap once a series outgrows it
        var ring = new Array[Double](math.min(cap, 256))
        var seen = 0L
        rows.foreach { r =>
          val idx = (seen % cap).toInt
          if (idx >= ring.length)
            ring = java.util.Arrays.copyOf(ring,
              math.min(cap, math.max(ring.length * 2, idx + 1)))
          ring(idx) = r.getDouble(2)
          seen += 1
        }
        val len = math.min(seen, cap.toLong).toInt
        if (seen <= p) {
          Iterator.single(SeriesMetrics(series, Double.NaN, Double.NaN,
            0L, threshold, breached = false))
        } else {
          // wrapped ⇒ ring.length == cap; unwrapped ⇒ start == 0, i < len
          val start = if (seen >= cap) (seen % cap).toInt else 0
          val window = Array.tabulate(len)(i => ring((start + i) % ring.length))
          val (hist, truth) = window.splitAt(len - p)
          val (mean, qPreds) = forecaster.predict(hist, p, quantiles)
          var sqErr = 0.0; var absSum = 0.0
          val qlSum = new Array[Double](quantiles.length)
          var i = 0
          while (i < p) {
            val t = truth(i)
            val e = t - mean(i)
            sqErr += e * e
            absSum += math.abs(t)
            var qi = 0
            while (qi < quantiles.length) {
              val q = quantiles(qi); val pr = qPreds(q)(i)
              qlSum(qi) += (if (t > pr) q * (t - pr) else (1.0 - q) * (pr - t))
              qi += 1
            }
            i += 1
          }
          val rmse = math.sqrt(sqErr / p)
          val meanWql = qlSum.map(2.0 / absSum * _).sum / quantiles.length
          Iterator.single(SeriesMetrics(series, rmse, meanWql, p.toLong,
            threshold, meanWql >= threshold))
        }
      }
      .toDF("series", "rmse", "mean_wql", "n", "threshold", "breached")
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
