package graft

import java.nio.file.{Files, Paths}
import java.time.Instant

import org.apache.spark.sql.functions._
import graft.batch.{Forecaster, NaiveForecaster}
import graft.monitor.{EvaluationReport, MonitoringCapture, MonitoringJob}

/** Golden-file checks for the rendered reference artifacts:
  * targets-quantiles.csv + evaluation.json (evaluate.py:60-110) and the
  * data-capture JSONL pairs (monitoring_data_collection.py:39-81,194-216). */
class ArtifactsSpec extends SparkSpec {
  import spark.implicits._

  test("evaluation report: golden CSV and JSON") {
    val aligned = Seq(
      (1, 10.0, 9.0, 8.0, 9.0, 10.5),
      (2, 12.0, 12.0, 11.0, 12.0, 13.0))
      .toDF("__pos", "target", "prediction_mean", "pred_low", "pred_mid", "pred_up")
    val out = tmpDir("eval")
    val rmse = graft.batch.Evaluation.rmse(aligned, "target", "prediction_mean")
    val (_, wql) = graft.batch.Evaluation.weightedQuantileLoss(aligned, "target",
      Seq(0.05 -> "pred_low", 0.5 -> "pred_mid", 0.95 -> "pred_up"))
    EvaluationReport.write(aligned, "__pos", out, 0.05, 0.95, rmse, wql)

    val csv = Files.readString(Paths.get(out, "targets-quantiles.csv")).trim.split("\n")
    assert(csv(0) === "target,prediction_mean,prediction_0.05,prediction_0.5," +
      "prediction_0.95,square_errors,quantile_loss_0.05,quantile_loss_0.5,quantile_loss_0.95")
    // row 1: err=1 → sq=1; ql_low=0.05*(10-8)=0.1; ql_mid=0.5*1; ql_up=0.95*(... target<pred → 0.05*0.5)
    assert(csv(1) === "10.0,9.0,8.0,9.0,10.5,1.0,0.1,0.5,0.025000000000000022")
    assert(csv(2) === "12.0,12.0,11.0,12.0,13.0,0.0,0.05,0.0,0.050000000000000044")
    // rmse = sqrt((1+0)/2); wql weight = 2/22
    assert(math.abs(rmse - math.sqrt(0.5)) < 1e-15)
    val json = Files.readString(Paths.get(out, "evaluation.json"))
    assert(json ===
      s"""{"deepar_metrics": {"rmse": {"value": $rmse, "standard_deviation": "NaN"}, """ +
        s""""weighted_quantile_loss": {"value": $wql, "standard_deviation": "NaN"}}}""")
  }

  test("capture JSONL: shared eventId, golden record shapes, deterministic") {
    val out = tmpDir("capture")
    val t = Instant.parse("2026-08-12T09:00:00Z")
    val ids = MonitoringCapture.write("2024-01-01 00:00:00", Seq(1.0, 2.0),
      midPreds = Seq(3.5), truth = Seq(4.0), out, t)
    assert(ids.length === 1)
    val pred = Files.readString(Paths.get(out, "predictions/2026/08/12/09/record_0.jsonl"))
    val gt = Files.readString(Paths.get(out, "ground-truth/2026/08/12/09/record_0.jsonl"))
    assert(pred ===
      s"""{"captureData": {"endpointInput": {"observedContentType": "application/json", """ +
        s""""mode": "INPUT", "data": "{\\"instances\\" : [{\\"start\\": \\"2024-01-01 00:00:00\\", \\"target\\": [1.0, 2.0]}] }", "encoding": "JSON"}, """ +
        s""""endpointOutput": {"observedContentType": "text/csv; charset=character-encoding", """ +
        s""""mode": "OUTPUT", "data": "3.5", "encoding": "CSV"}}, """ +
        s""""eventMetadata": {"eventId": "${ids.head}", "inferenceId": "${ids.head}", """ +
        s""""inferenceTime": "2026-08-12T09:00:00Z"}, "eventVersion": "0"}""")
    assert(gt ===
      s"""{"groundTruthData": {"data": "4.0", "encoding": "CSV"}, """ +
        s""""eventMetadata": {"eventId": "${ids.head}"}, "eventVersion": "0"}""")
    // deterministic ids on rerun
    val ids2 = MonitoringCapture.write("2024-01-01 00:00:00", Seq(1.0, 2.0),
      Seq(3.5), Seq(4.0), tmpDir("capture2"), t)
    assert(ids === ids2)
  }

  test("monitoring job: history cap bounds the driver transfer; artifacts rendered") {
    implicit val s = spark
    // "multi-year" table: 1000 points, cap at 100 → forecaster must see 100
    val df = (1 to 1000).map(i => (f"m$i%04d", i.toDouble)).toDF("tx_minute", "avg_fee_1min")
    var seen = -1
    val spy = new Forecaster {
      val inner = new NaiveForecaster
      def predict(h: Array[Double], p: Int, qs: Seq[Double]) = {
        seen = h.length; inner.predict(h, p, qs)
      }
    }
    val out = tmpDir("mon")
    MonitoringJob.run(df, "tx_minute", "avg_fee_1min", spy, threshold = 1e9,
      predictionLength = 5, maxHistory = 100L, artifactDir = Some(out),
      uploadTime = Instant.parse("2026-08-12T10:00:00Z"))
    assert(seen === 100, "history collect must be capped")
    assert(Files.exists(Paths.get(out, "targets-quantiles.csv")))
    assert(Files.exists(Paths.get(out, "evaluation.json")))
    assert(Files.exists(Paths.get(out, "predictions/2026/08/12/10/record_4.jsonl")))
    assert(Files.exists(Paths.get(out, "ground-truth/2026/08/12/10/record_4.jsonl")))
  }
}
