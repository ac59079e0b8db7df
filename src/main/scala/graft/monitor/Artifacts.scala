package graft.monitor

import java.nio.charset.StandardCharsets.UTF_8
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.batch.Evaluation

/** The two rendered evaluation/monitoring artifacts of the reference's
  * SageMaker pipelines, reproduced file-for-file.
  */
object EvaluationReport {

  /** Python-style quantile label: 0.05 → "0.05", 0.5 → "0.5". */
  private def qName(q: Double): String = {
    val s = q.toString
    if (s.endsWith(".0")) s.dropRight(2) else s
  }

  /** Render `targets-quantiles.csv` (target, mean + quantile predictions,
    * square errors, per-quantile pinball losses — ref:
    * pipeline-modelbuild-code/pipelines/blockchain/evaluate.py:60-90,104-108)
    * and `evaluation.json` (rmse + mean weighted quantile loss report,
    * evaluate.py:94-110) under `outDir`.
    *
    * @param aligned  positionally aligned frame with columns
    *                 (orderCol, target, prediction_mean, pred_low, pred_mid,
    *                 pred_up) — one row per forecast step, so the single-file
    *                 CSV is bounded by the prediction window, never the table
    * @param rmse     precomputed metrics for the report (the caller already
    * @param meanWql  has them — recomputing here would double the Spark jobs
    *                 per monitoring run and create two sources of truth) */
  def write(aligned: DataFrame, orderCol: String, outDir: String,
            lowQ: Double, upQ: Double, rmse: Double, meanWql: Double): Unit = {
    val err = col("target") - col("prediction_mean")
    val full = aligned.select(
      col(orderCol),
      col("target"),
      col("prediction_mean"),
      col("pred_low").as(s"prediction_${qName(lowQ)}"),
      col("pred_mid").as("prediction_0.5"),
      col("pred_up").as(s"prediction_${qName(upQ)}"),
      (err * err).as("square_errors"),
      Evaluation.quantileLoss(col("target"), col("pred_low"), lowQ)
        .as(s"quantile_loss_${qName(lowQ)}"),
      Evaluation.quantileLoss(col("target"), col("pred_mid"), 0.5)
        .as("quantile_loss_0.5"),
      Evaluation.quantileLoss(col("target"), col("pred_up"), upQ)
        .as(s"quantile_loss_${qName(upQ)}"))

    // single CSV in forecast-step order (one evaluation window => tiny);
    // everything goes through the Hadoop FS so a non-local outDir
    // (s3a/hdfs) works for both artifacts
    val stage = new Path(outDir, "_csv")
    full.coalesce(1).sortWithinPartitions(orderCol).drop(orderCol)
      .write.option("header", "true").csv(stage.toString)
    val fs = stage.getFileSystem(aligned.sparkSession.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(stage).map(_.getPath)
      .filter(_.getName.startsWith("part-")).head
    val csvDest = new Path(outDir, "targets-quantiles.csv")
    // rerun into an existing outDir: rename onto an existing target fails
    // silently on some filesystems and would leave a stale CSV beside a
    // fresh evaluation.json
    if (fs.exists(csvDest)) fs.delete(csvDest, false)
    require(fs.rename(part, csvDest), s"rename $part -> $csvDest failed")
    fs.delete(stage, true)

    val report =
      s"""{"deepar_metrics": {"rmse": {"value": $rmse, "standard_deviation": "NaN"}, """ +
        s""""weighted_quantile_loss": {"value": $meanWql, "standard_deviation": "NaN"}}}"""
    val jsonOut = fs.create(new Path(outDir, "evaluation.json"), true)
    try jsonOut.write(report.getBytes(UTF_8)) finally jsonOut.close()
  }
}

/** SageMaker data-capture-format JSONL writer: one predictions record and one
  * ground-truth record per forecast step, correlated by a shared `eventId`
  * (ref: pipeline-modelmonitor-code/.../monitoring_data_collection.py:39-81,
  * 194-216). Files land under `predictions/yyyy/MM/dd/HH/record_<i>.jsonl`
  * and `ground-truth/yyyy/MM/dd/HH/record_<i>.jsonl` like the reference's
  * upload-time-prefixed S3 keys.
  *
  * Driver-rendered: record count is the prediction window (tens of rows), so
  * no distributed write is warranted. Event ids are deterministic
  * (name-UUIDs of upload hour + step) so reruns correlate identically.
  */
object MonitoringCapture {

  private val dirFmt = DateTimeFormatter.ofPattern("yyyy/MM/dd/HH").withZone(ZoneOffset.UTC)
  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'").withZone(ZoneOffset.UTC)

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** @param start    series start key (the DeepAR instances `start` field)
    * @param history  input/context series (the `instances` payload)
    * @param midPreds mid-quantile (0.5) prediction per step — the reference
    *                 captures this as the endpoint output
    *                 (monitoring_data_collection.py:204-207)
    * @param truth    observed value per step (ground-truth record payload)
    * @param uploadTime fixes both the path prefix and inferenceTime
    * @param conf     Hadoop configuration resolving `outDir`'s filesystem —
    *                 like [[EvaluationReport]], everything goes through the
    *                 Hadoop FS so a non-local outDir (s3a/hdfs) works
    * @return the shared eventId per step, in step order */
  def write(start: String, history: Seq[Double], midPreds: Seq[Double],
            truth: Seq[Double], outDir: String, uploadTime: Instant,
            conf: org.apache.hadoop.conf.Configuration =
              new org.apache.hadoop.conf.Configuration()): Seq[String] = {
    require(midPreds.length == truth.length, "one prediction per ground-truth step")
    val hourDir = dirFmt.format(uploadTime)
    val infTime = tsFmt.format(uploadTime)
    val instances =
      s"""{"instances" : [{"start": "${esc(start)}", "target": [${history.mkString(", ")}]}] }"""
    val base = new Path(outDir)
    val fs = base.getFileSystem(conf)
    val predDir = new Path(base, s"predictions/$hourDir")
    val truthDir = new Path(base, s"ground-truth/$hourDir")
    fs.mkdirs(predDir)
    fs.mkdirs(truthDir)
    def put(p: Path, s: String): Unit = {
      val o = fs.create(p, true)
      try o.write(s.getBytes(UTF_8)) finally o.close()
    }
    truth.indices.map { i =>
      val eventId = UUID.nameUUIDFromBytes(s"$start/$hourDir/$i".getBytes(UTF_8)).toString
      val pred =
        s"""{"captureData": {"endpointInput": {"observedContentType": "application/json", """ +
          s""""mode": "INPUT", "data": "${esc(instances)}", "encoding": "JSON"}, """ +
          s""""endpointOutput": {"observedContentType": "text/csv; charset=character-encoding", """ +
          s""""mode": "OUTPUT", "data": "${midPreds(i)}", "encoding": "CSV"}}, """ +
          s""""eventMetadata": {"eventId": "$eventId", "inferenceId": "$eventId", """ +
          s""""inferenceTime": "$infTime"}, "eventVersion": "0"}"""
      val gt =
        s"""{"groundTruthData": {"data": "${truth(i)}", "encoding": "CSV"}, """ +
          s""""eventMetadata": {"eventId": "$eventId"}, "eventVersion": "0"}"""
      put(new Path(predDir, s"record_$i.jsonl"), pred)
      put(new Path(truthDir, s"record_$i.jsonl"), gt)
      eventId
    }
  }
}
