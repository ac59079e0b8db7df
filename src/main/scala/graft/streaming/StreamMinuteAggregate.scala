package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Exact

/** A1 — the streaming form of the reference's resident query: event-time
  * 1-minute tumbling window with a 60 s watermark computing
  * COUNT(hash), SUM(fee), AVG(fee)
  * (ref: resources/flink/main.py:105-120 window+agg, :77 watermark).
  *
  * Output mode guidance (SURVEY.md §7.4 hard part 2): use *update* mode with
  * the keyed upsert sink ([[graft.store.KeyedParquetTable]]) — it reproduces
  * the reference's "window result may be re-emitted; put_record overwrites by
  * tx_minute" behavior (delivery_stream_to_featurestore/main.py:54-62) and
  * sidesteps Spark's lack of an idle-source watermark advance (an open minute
  * is emitted on every trigger that updates it, not held until the watermark
  * closes it).
  *
  * Scale notes: streaming stateful agg keeps one state row per open window —
  * bounded by (watermark delay / window size) windows, regardless of input
  * rate. The pre-shuffle partial aggregation bounds shuffle volume per
  * trigger by #open-windows × #partitions.
  */
object StreamMinuteAggregate {

  /** @param txs streaming DataFrame with event-time and measure columns
    * @param lateness watermark delay (reference: 60 seconds) */
  def apply(txs: DataFrame, timeCol: String = "tx_time", feeCol: String = "fee",
            lateness: String = "60 seconds"): DataFrame =
    onWatermarked(txs.withWatermark(timeCol, lateness), timeCol, feeCol)

  /** Variant for inputs that already carry a watermark (Spark disallows
    * redefining one — a pipeline with upstream stateful ops sets it once). */
  def onWatermarked(txs: DataFrame, timeCol: String = "tx_time",
                    feeCol: String = "fee"): DataFrame = {
    txs
      .groupBy(window(col(timeCol), "1 minute").as("w"))
      .agg(
        // count rows, not fee values: a null-fee tx still counts (matches
        // the batch form and the reference's COUNT(hash) over non-null hash)
        count(lit(1)).as("total_nb_trx_1min"),
        sum(col(feeCol)).as("total_fee_1min"),
        avg(col(feeCol)).as("avg_fee_1min"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("tx_minute"),
        col("total_nb_trx_1min"),
        col("total_fee_1min"),
        col("avg_fee_1min"),
        unix_timestamp().cast("double").as("event_time"))
  }
}
