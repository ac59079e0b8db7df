package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQueryListener}

/** S5/S11 — auxiliary sinks: the raw archive and the metrics listener. */
object Sinks {

  /** S5 — immutable raw archive: append-only passthrough of the unparsed
    * envelope stream (the Firehose→S3 leg,
    * ref: lib/ingestion/data-ingestion-stack.ts:102-122). Kept as the
    * original JSON text so replays re-enter the pipeline unchanged. */
  def rawArchive(raw: DataFrame, dir: String, checkpoint: String): DataStreamWriter[Row] =
    raw.writeStream
      .format("text")
      .option("path", dir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")

  /** S11 — per-batch throughput metrics
    * (ref: resources/services/ingestion-worker/lib.js:68-92 puts
    * ingested-bytes metrics to CloudWatch): a StreamingQueryListener that
    * appends one row per completed micro-batch to a parquet metrics table.
    * Listener callbacks run on the driver; rows are tiny (one per trigger). */
  class MetricsListener(spark: SparkSession, path: String) extends StreamingQueryListener {
    import spark.implicits._

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      Seq((p.id.toString, p.batchId, p.timestamp,
          p.numInputRows, p.inputRowsPerSecond, p.processedRowsPerSecond))
        .toDF("query_id", "batch_id", "ts", "input_rows", "input_rps", "processed_rps")
        .write.mode("append").parquet(path)
    }
  }
}
