package graft.batch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Exact

/** A1 — the reference's core operator: 1-minute tumbling aggregation of a
  * transaction stream into `{tx_minute, total_nb_trx_1min, total_fee_1min,
  * avg_fee_1min}` (ref: resources/flink/main.py:105-120; sink schema
  * resources/flink/main.py:90-95).
  *
  * This is the batch form (used for backfill/oracle); the streaming form with
  * watermarking lives in [[graft.streaming.StreamMinuteAggregate]]. Both emit
  * the identical schema so the sink/upsert path is shared.
  *
  * Scale notes: a single `groupBy(minute)` is one hash-shuffle on the minute
  * key; partial aggregation (map-side combine) reduces each input partition to
  * at most #distinct-minutes rows before the exchange, so the shuffle volume
  * is bounded by cardinality(minute) × partitions, not row count. No skew risk
  * beyond hot minutes, which partial agg already absorbs.
  */
object MinuteAggregate {

  /** `"yyyy-MM-dd HH:mm:ss"` string of the window start — the reference's
    * record key format (P4: resources/flink/main.py:114,123-129, realized with
    * a builtin instead of a UDF). */
  def minuteKey(ts: Column): Column =
    date_format(date_trunc("minute", ts), "yyyy-MM-dd HH:mm:ss")

  /** Aggregate a batch of events into per-minute rows.
    *
    * @param events  input with an event-time column and a fee/measure column
    * @param timeCol event-time timestamp column name
    * @param feeCol  measure column name (reference: `fee`)
    */
  def apply(events: DataFrame, timeCol: String, feeCol: String): DataFrame = {
    events
      .groupBy(minuteKey(col(timeCol)).as("tx_minute"))
      .agg(
        count(lit(1)).as("total_nb_trx_1min"),
        Exact.sumD(col(feeCol)).as("total_fee_1min"),
        (Exact.sumD(col(feeCol)) / count(col(feeCol))).as("avg_fee_1min"))
  }
}
