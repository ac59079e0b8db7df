package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 — source adapters standing in for the reference's HTTP poller
  * (ref: resources/services/ingestion-worker/lib.js:36-50 polls
  * blockchain.info every INGESTION_INTERVAL ms and emits envelope JSON).
  *
  * In a zero-egress engine the poller is modeled as: (a) a file-directory
  * stream replaying fixture envelopes (the production pattern for landing
  * zones: each poll drops one JSON file), and (b) a rate-source-driven
  * synthetic generator for load tests — `rate` emits (timestamp, value) at a
  * controlled rows/sec, mirroring the poll cadence.
  */
object SourceAdapters {

  /** Stream envelope-JSON files from a directory (one line = one envelope).
    * maxFilesPerTrigger bounds per-batch work the way the 15 s poll bounds
    * the reference's ingest. */
  def fixtureDirectory(spark: SparkSession, dir: String,
                       maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)

  /** Synthetic tx envelope stream at `rowsPerSecond`, for throughput tests.
    * Deterministic per (seed, value): hash/fee/time derive from the rate
    * source's monotonically increasing `value`. */
  def syntheticRate(spark: SparkSession, rowsPerSecond: Int, txsPerEnvelope: Int = 10): DataFrame = {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
    val txObj = (i: org.apache.spark.sql.Column) =>
      concat(lit("""{"hash":""""), md5(i.cast("string")),
        lit("""","ver":1,"vin_sz":1,"vout_sz":1,"size":200,"weight":800,"fee":"""),
        (pmod(i, lit(10000)) + 100).cast("string"),
        lit(""","relayed_by":"0.0.0.0","lock_time":0,"tx_index":"""), i.cast("string"),
        lit(""","double_spend":false,"time":"""),
        unix_timestamp(col("timestamp")).cast("string"),
        lit(""","block_index":null,"block_height":null,"inputs":"[]","out":"[]","rbf":false}"""))
    rate.select(
      concat(lit("""{"version":0,"id":"r","detail-type":"Incoming Data","source":"rate","account":1,"time":"","region":"","resources":[],"detail":{"txs":["""),
        concat_ws(",", transform(sequence(lit(0), lit(txsPerEnvelope - 1)),
          j => txObj(col("value") * txsPerEnvelope + j))),
        lit("]}}")).as("value"))
  }
}
