package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schema.Schemas

/** S3/P1/P3 — the ingestion front half: envelope filter, tx unnest, event
  * time derivation. Works identically on batch and streaming DataFrames (the
  * operators are all stateless projections).
  */
object Ingest {

  /** S3 — the EventBridge rule: only `detail-type == "Incoming Data"` flows
    * to processing; health-check events are dropped
    * (ref: lib/ingestion/data-ingestion-stack.ts:87-97). */
  def incomingDataOnly(envelopes: DataFrame, detailTypeCol: String = "detail-type"): DataFrame =
    envelopes.filter(col(s"`$detailTypeCol`") === "Incoming Data")

  /** P1 — parse a raw JSON envelope string column and unnest `detail.txs`
    * into one row per transaction with the 17 tx columns
    * (ref: source-schema.json:44-117 JSONPath flattening;
    * stream_processing/main.py:35 imperative loop). */
  def unnestTxs(rawJson: DataFrame, jsonCol: String = "value"): DataFrame = {
    val parsed = rawJson.select(from_json(col(jsonCol), Schemas.envelope).as("e"))
    incomingDataOnly(parsed.select(col("e.`detail-type`").as("detail_type"),
        col("e.detail.txs").as("txs")), "detail_type")
      .select(explode(col("txs")).as("tx"))
      .select(col("tx.*"))
  }

  /** P3 — event-time column from epoch seconds
    * (ref: resources/flink/main.py:70-71 `TO_TIMESTAMP(FROM_UNIXTIME(time))`). */
  def withEventTime(txs: DataFrame, epochCol: String = "time",
                    out: String = "tx_time"): DataFrame =
    txs.withColumn(out, timestamp_seconds(col(epochCol)))
}
