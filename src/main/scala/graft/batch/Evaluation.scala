package graft.batch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Exact

/** A5/A6/A7/J2 — forecast evaluation: positional target/prediction alignment,
  * RMSE, elementwise pinball (quantile) loss, and mean weighted quantile loss
  * (ref: pipelines/blockchain/evaluate.py:32-91; duplicated in
  * pipeline-modelmonitor-code/.../custom_monitoring_metrics.py:38-39,140-169).
  */
object Evaluation {

  /** A6 — elementwise pinball loss for quantile level `q`
    * (ref: evaluate.py:32-33 `np.where(x > q_pred, alpha*(x-q_pred), ...)`). */
  def quantileLoss(target: Column, qPred: Column, q: Double): Column =
    when(target > qPred, lit(q) * (target - qPred))
      .otherwise(lit(1.0 - q) * (qPred - target))

  /** J2 — align two independently ordered frames by position (the reference
    * zips a pandas column against a JSON array by index, evaluate.py:60-70).
    * Requires explicit, total orderings on both sides — implicit file order is
    * not a contract in a distributed engine. */
  def alignByPosition(targets: DataFrame, targetOrder: String,
                      preds: DataFrame, predOrder: String): DataFrame = {
    // global windows over the EVALUATION frames (forecast-horizon rows, the
    // reference zips arrays of that length in pandas) — bounded spine, not
    // corpus data; past that, rank via Ranking.globalRowNumber
    val wt = Window.partitionBy().orderBy(col(targetOrder))
    val wp = Window.partitionBy().orderBy(col(predOrder))
    val t = targets.withColumn("__pos", row_number().over(wt))
    val p = preds.withColumn("__pos", row_number().over(wp))
    t.join(p, "__pos")
  }

  /** A5 — RMSE between target and mean-prediction columns, reduced through an
    * exact decimal sum so the result is parallelism-independent. */
  def rmse(df: DataFrame, targetCol: String, predCol: String): Double = {
    val err = col(targetCol) - col(predCol)
    df.agg(sqrt(Exact.avgD(err * err, scale = 10)).as("rmse"))
      .head().getDouble(0)
  }

  /** A7 — mean weighted quantile loss (ref: evaluate.py:82-91):
    * weight = 2 / sum(|target|); wQL_q = weight * sum(pinball_q);
    * result = mean over the supplied quantiles.
    * @param quantilePreds  quantile level → prediction column name
    * @return (per-quantile wQL, mean wQL) */
  def weightedQuantileLoss(df: DataFrame, targetCol: String,
                           quantilePreds: Seq[(Double, String)]): (Seq[(Double, Double)], Double) = {
    val aggs = Exact.sumD(abs(col(targetCol)), 10).as("abs_sum") +:
      quantilePreds.map { case (q, c) =>
        Exact.sumD(quantileLoss(col(targetCol), col(c), q), 10).as(s"ql_$c")
      }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val weight = 2.0 / row.getDouble(0)
    val perQ = quantilePreds.zipWithIndex.map { case ((q, _), i) =>
      q -> weight * row.getDouble(i + 1)
    }
    (perQ, perQ.map(_._2).sum / perQ.size)
  }
}

/** Quantile-bound derivation from a confidence level.
  * Two reference variants:
  *  - pipeline: low/up = round(0.5 ∓ confidence*0.005, 3)
  *    (ref: pipelines/blockchain/pipeline.py:271-275)
  *  - monitoring: confidence whitelisted to {60,70,80,90}, 2-dp rounding
  *    (ref: pipeline-modelmonitor-code/.../monitoring_data_collection.py:99-105)
  */
object QuantileBounds {
  private def round3(x: Double, dp: Int): Double = {
    val m = math.pow(10, dp)
    math.round(x * m) / m
  }

  /** Pipeline variant: e.g. confidence 90 → (0.05, 0.95). */
  def pipeline(confidence: Int): (Double, Double) =
    (round3(0.5 - confidence * 0.005, 3), round3(0.5 + confidence * 0.005, 3))

  /** Monitoring variant: confidence not in {60,70,80,90} falls back to 90. */
  def monitoring(confidence: Int): (Double, Double) = {
    val c = if (Set(60, 70, 80, 90).contains(confidence)) confidence else 90
    (round3(0.5 - c * 0.005, 2), round3(0.5 + c * 0.005, 2))
  }
}
