package graft.batch

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** DeepAR-format dataset writer — the reference's preprocessing outputs
  * (ref: pipelines/blockchain/preprocess.py:123-167):
  *   train/train.json            1 series (prefix n - p - K·p)
  *   validation/validation.json  K expanding-prefix series
  *   test/test-inputs.json       1 series (prefix n - p)
  *   test/test-targets.csv       last p rows, CSV with header
  *
  * JSON lines are rendered manually because the format mixes numbers with the
  * literal string "NaN" for non-finite values
  * (ref: pipeline-modelmonitor-code/.../utils.py:124-125) — a shape Spark's
  * JSON writer cannot emit from a double array.
  */
object DeepAR {

  /** `{"start": "...", "target": [1.0, "NaN", ...]}` */
  def renderSeries(ts: TimeSeries): String = {
    val sb = new StringBuilder(ts.target.length * 8 + 32)
    sb.append("{\"start\": \"").append(ts.start).append("\", \"target\": [")
    var i = 0
    while (i < ts.target.length) {
      if (i > 0) sb.append(", ")
      val v = ts.target(i)
      if (java.lang.Double.isFinite(v)) sb.append(v) else sb.append("\"NaN\"")
      i += 1
    }
    sb.append("]}").toString
  }

  private def writeJsonLines(series: Seq[TimeSeries], path: String)
                            (implicit spark: SparkSession): Unit = {
    import spark.implicits._
    // series count is tiny (1 or K); the heavy lifting (ordered collection)
    // already happened distributed in SeriesETL.toSeries
    spark.createDataset(series.map(renderSeries))
      .coalesce(1).write.mode("overwrite").text(path)
  }

  /** Run the full reference split + write. `df` is the aggregate series
    * (orderCol ascending defines time order). Returns the split bounds. */
  def writeSplits(df: DataFrame, orderCol: String, valueCol: String, outDir: String,
                  predictionLength: Int = 5, numValidationWindows: Int = 4)
                 (implicit spark: SparkSession): SplitSpec.Bounds = {
    val n = df.count()
    val b = SplitSpec.bounds(n, predictionLength, numValidationWindows)
    val idx = SeriesETL.indexed(df, orderCol).cache()
    def series(d: DataFrame): TimeSeries =
      SeriesETL.toSeries(d, orderCol, valueCol).head()

    writeJsonLines(Seq(series(SeriesETL.prefix(idx, b.trainLen))), s"$outDir/train")
    writeJsonLines(
      b.validationLens.map(len => series(SeriesETL.prefix(idx, len))),
      s"$outDir/validation")
    writeJsonLines(Seq(series(SeriesETL.prefix(idx, b.testInputLen))), s"$outDir/test_inputs")
    SeriesETL.tail(idx, b.testTargetLen)
      .orderBy(orderCol).coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(s"$outDir/test_targets")
    idx.unpersist()
    b
  }
}

/** The model boundary: the reference treats DeepAR itself as an opaque AWS
  * container (SURVEY.md §7.5) — the engine's contract is this trait. */
trait Forecaster extends Serializable {
  /** Predict `p` steps past the end of `history` at the given quantile
    * levels. Returns (mean, quantile → values). */
  def predict(history: Array[Double], p: Int,
              quantiles: Seq[Double]): (Array[Double], Map[Double, Array[Double]])
}

/** Holt linear-trend exponential smoothing — a real forecaster in the
  * reference's opaque-model slot (one that actually extrapolates trend,
  * unlike [[NaiveForecaster]]'s carry-forward): level/trend recurrence
  * l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1}), b_t = β(l_t − l_{t−1}) +
  * (1−β)b_{t−1}, h-step forecast l + h·b. Defaults α = β = 0.25 are exact
  * binary fractions, and every update is a fixed-order IEEE chain, so an
  * independent engine (the DuckDB oracle's recursive CTE) reproduces
  * level, trend, and every forecast bit for bit. Quantile bands collapse
  * to the mean (the point-forecast form — the evaluation plumbing scores
  * them like any other quantile set). Histories of length 1 fall back to
  * carry-forward; level/trend init is the standard (l₁ = x₁,
  * b₁ = x₂ − x₁). */
class HoltForecaster(alpha: Double = 0.25, beta: Double = 0.25)
  extends Forecaster {
  private val ia = 1.0 - alpha
  private val ib = 1.0 - beta
  override def predict(history: Array[Double], p: Int,
                       quantiles: Seq[Double]): (Array[Double], Map[Double, Array[Double]]) = {
    val mean =
      if (history.isEmpty) Array.fill(p)(Double.NaN)
      else if (history.length == 1) Array.fill(p)(history(0))
      else {
        var level = history(0)
        var trend = history(1) - history(0)
        var t = 1
        while (t < history.length) {
          val x = history(t)
          val prevLevel = level
          level = alpha * x + ia * (level + trend)
          trend = beta * (level - prevLevel) + ib * trend
          t += 1
        }
        Array.tabulate(p)(h => level + (h + 1).toDouble * trend)
      }
    (mean, quantiles.map(q => q -> mean.clone()).toMap)
  }
}

/** Deterministic stand-in: last-observation carry-forward at every quantile
  * (what the monitoring/evaluation plumbing is exercised with in tests). */
class NaiveForecaster extends Forecaster {
  override def predict(history: Array[Double], p: Int,
                       quantiles: Seq[Double]): (Array[Double], Map[Double, Array[Double]]) = {
    val last = if (history.isEmpty) Double.NaN else history.last
    val flat = Array.fill(p)(last)
    (flat, quantiles.map(q => q -> flat.clone()).toMap)
  }
}
