package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end replay for the S10/P2/O2 dedup seen-set
  * (ref: resources/lambdas/stream_processing/main.py:31-69 — conditional
  * put against a TTL'd seen-set): the firehose re-emits an exact copy of
  * every third event, the stream drops duplicates by event_id within the
  * watermark, and the append sink must equal the ORIGINAL
  * (pre-duplication) row set exactly — row for row, no extra copy, no
  * lost original.
  *
  * Determinism under replay (why this oracle is exact): the copy is
  * byte-identical to its original, so which arrival is kept is
  * unobservable; and the copy lands in the SAME day chunk, at most a few
  * files after its original. A same-BATCH duplicate can never race
  * eviction (eviction uses the previous batch's watermark), but
  * `maxFilesPerTrigger` may split a chunk across batches — so the
  * watermark delay (48 h) exceeds the one-day span a split can introduce
  * by an order of magnitude: state for event time T survives until the
  * watermark passes T + 48 h, and the duplicate arrives within T + 24 h
  * worst-case. Dedup-state size stays bounded by (rate × 48 h),
  * independent of history — the property that keeps the operator viable
  * at 100 TB/day (VERDICT on S10's scale story).
  */
object StreamDedupReplay {

  def run(spark: SparkSession, events: DataFrame, workDir: String,
          maxFilesPerTrigger: Int = 4): DataFrame = {
    val dup = events.filter(col("event_id") % 3 === 0)
    StreamJoin.writeDayChunkedParquet(spark, events.unionAll(dup), workDir, "ts")
    val src = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema(events.schema).parquet(s"$workDir/data")
    val deduped = StreamDedup
      .withinWatermark(src, Seq("event_id"), "ts", delay = "48 hours")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("t_us"), col("value"))
    val q = deduped.writeStream.format("parquet")
      .option("path", s"$workDir/sink")
      .option("checkpointLocation", s"$workDir/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow)
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$workDir/sink")
  }
}
