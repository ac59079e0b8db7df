package graft.batch

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One univariate series in the reference's DeepAR JSON-lines shape
  * (ref: pipelines/blockchain/preprocess.py:123-155). */
case class TimeSeries(start: String, target: Array[Double])

/** Split-length arithmetic of the reference preprocessing step
  * (ref: pipelines/blockchain/preprocess.py:101-155).
  *
  * Given n ordered points, prediction length p and K validation windows:
  *   - test targets  = last p rows
  *   - test inputs   = first n - p rows
  *   - validation k  = prefix of length n - p - (K - k) * p,  k = 1..K
  *   - train         = first n - p - K * p rows
  * Degenerate fallback (ref: preprocess.py:108-114): when n < p*(K+1)+p the
  * reference shrinks p to int(0.05 * n) (which can be 0 → empty splits; we
  * reproduce that faithfully, see SeriesETLSpec).
  */
object SplitSpec {
  case class Bounds(p: Int, trainLen: Long, validationLens: Seq[Long],
                    testInputLen: Long, testTargetLen: Long)

  def bounds(n: Long, predictionLength: Int = 5, numValidationWindows: Int = 4): Bounds = {
    val k = numValidationWindows
    val minDataLength = predictionLength.toLong * (k + 1) + predictionLength
    val p = if (n < minDataLength) (n * 0.05).toInt else predictionLength
    val trainLen = n - p - k.toLong * p
    val valLens = (1 to k).map(i => n - p - (k - i).toLong * p)
    Bounds(p, trainLen, valLens, n - p, p)
  }
}

/** O1/O3/O4/O5 — ordered-series ETL: sort, head/tail splits, expanding
  * validation windows, series→array collection, DeepAR JSON-lines output
  * (ref: pipelines/blockchain/preprocess.py:93-167).
  *
  * Scale notes: the reference sorts the whole frame in pandas on one node.
  * Here ordering is expressed once as a window over an explicit sort key; for
  * a single logical series the window is inherently one partition — fine for
  * the reference's per-minute cardinality (1440 rows/day) but callers with
  * many series should partition the window by a series id column (supported
  * via `seriesCol`), which Spark range-shuffles instead of single-tasking.
  */
object SeriesETL {
  private val RN = "__rn"
  private val N = "__n"

  /** Attach a 1-based position and total count per series, ordered by
    * `orderCol` (ties broken by the order column being unique — the
    * reference's tx_minute key is).
    *
    * Scale note: with `seriesCol = None` the windows are global — bounded,
    * because they run over the MINUTE-aggregate series spine (rows = minutes
    * in the horizon, ~526k/year even at 100 TB of raw events), never over
    * raw data. Multi-series callers pass `seriesCol` and partition. */
  def indexed(df: DataFrame, orderCol: String, seriesCol: Option[String] = None): DataFrame = {
    val w0 = seriesCol.map(s => Window.partitionBy(s)).getOrElse(Window.partitionBy())
    val w = w0.orderBy(col(orderCol))
    df.withColumn(RN, row_number().over(w))
      .withColumn(N, count(lit(1)).over(w0))
  }

  /** First `len` rows of the ordered series (prefix / head split). */
  def prefix(indexedDf: DataFrame, len: Long): DataFrame =
    indexedDf.filter(col(RN) <= len).drop(RN, N)

  /** Last `len` rows of the ordered series (tail split). */
  def tail(indexedDf: DataFrame, len: Long): DataFrame =
    indexedDf.filter(col(RN) > col(N) - len).drop(RN, N)

  /** Rows with position in (from, to] — a bounded slice of the ordered
    * series (e.g. a capped history window ending at the forecast origin). */
  def range(indexedDf: DataFrame, from: Long, to: Long): DataFrame =
    indexedDf.filter(col(RN) > from && col(RN) <= to).drop(RN, N)

  /** O4 — expanding-window validation prefixes: k-th series is the prefix of
    * length n - p - (K-k)*p. Returns (k, prefixDf) pairs. */
  def validationPrefixes(indexedDf: DataFrame, b: SplitSpec.Bounds): Seq[(Int, DataFrame)] =
    b.validationLens.zipWithIndex.map { case (len, i) => (i + 1, prefix(indexedDf, len)) }

  /** O5 — collect the ordered series into one TimeSeries row (start = first
    * order key, target = values in order). Deterministic: collection happens
    * inside an ordered window, not via collect_list-after-shuffle. */
  def toSeries(df: DataFrame, orderCol: String, valueCol: String)
              (implicit spark: SparkSession): Dataset[TimeSeries] = {
    import spark.implicits._
    // global window over the minute-spine series (see [[indexed]]'s scale
    // note); the TimeSeries row it builds must fit one task by definition
    val w = Window.partitionBy().orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.select(
        first(col(orderCol)).over(w).cast("string").as("start"),
        collect_list(col(valueCol).cast("double")).over(w).as("target"),
        row_number().over(Window.partitionBy().orderBy(col(orderCol))).as("__rn"))
      .filter(col("__rn") === 1).drop("__rn")
      .as[TimeSeries]
  }

  /** Gap fill — regularize an irregular event stream onto a dense per-key
    * minute spine with forward fill (the resample/ffill step every
    * time-series ETL runs before a fixed-frequency model like the
    * reference's DeepAR, which requires target values at every step).
    *
    * Returns one row per (key, minute) of the global [min, max] minute
    * span: (`keyCol`, m, v, fv) where v is the observed per-minute decimal-
    * exact sum of `valueCol` (null for empty minutes) and fv carries the
    * last observed v forward (null only before the key's first
    * observation — leading minutes have nothing to carry).
    *
    * Scale shape: the observed relation is one narrow groupBy; the spine is
    * |keys| × span-minutes rows built from a broadcast bounds row (never a
    * per-event explode); the fill window partitions BY KEY, so Spark
    * shuffles each key's time-bounded spine to one task — the right unit of
    * order. Keys whose spine outgrows a task get the two-pass variant:
    * range-partition each key's timeline into buckets, carry each bucket's
    * last observation into the next as a boundary row (the Ranking.scala
    * prefix-sum discipline applied to "last value"). */
  def gapFillMinutes(df: DataFrame, tsCol: String, keyCol: String,
                     valueCol: String, sumScale: Int = 2): DataFrame = {
    val m = date_trunc("minute", col(tsCol))
    val obs = df.groupBy(col(keyCol), m.as("m"))
      .agg(graft.ops.Exact.sumD(col(valueCol), sumScale).as("v"))
    val bounds = df.agg(
      date_trunc("minute", min(col(tsCol))).as("lo"),
      date_trunc("minute", max(col(tsCol))).as("hi"))
    val spine = df.select(col(keyCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 minute"))).as("m"))
    spine.join(obs, Seq(keyCol, "m"), "left")
      .withColumn("fv", last(col("v"), ignoreNulls = true).over(
        Window.partitionBy(col(keyCol)).orderBy(col("m"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Full reference split: (train, validations, testInputs, testTargets). */
  def split(df: DataFrame, orderCol: String, predictionLength: Int = 5,
            numValidationWindows: Int = 4): (DataFrame, Seq[(Int, DataFrame)], DataFrame, DataFrame) = {
    val n = df.count()
    val b = SplitSpec.bounds(n, predictionLength, numValidationWindows)
    val idx = indexed(df, orderCol).cache()
    (prefix(idx, b.trainLen), validationPrefixes(idx, b),
      prefix(idx, b.testInputLen), tail(idx, b.testTargetLen))
  }
}
