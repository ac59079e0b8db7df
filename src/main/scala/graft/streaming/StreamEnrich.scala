package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-static broadcast enrichment, replayed end to end — the third
  * streaming-join topology after stream-stream inner/outer (StreamJoin):
  * a firehose joined per micro-batch against a SLOWLY-CHANGING dimension
  * read from storage (the reference's enrichment step: every ingested
  * record annotated from a side table before landing —
  * resources/lambdas/delivery_stream_to_featurestore/main.py joins the
  * incoming batch against prior state the same way).
  *
  * Semantics under test: a stream-static join is STATELESS — no watermark,
  * no keyed state, no eviction; each micro-batch hash-joins against the
  * static relation as-of that batch, and with the dimension frozen for the
  * replay the append sink must equal the plain batch join exactly. The
  * LEFT OUTER + coalesce('unknown') states the dim-miss contract (a new
  * user arrives before the dimension refresh lands).
  *
  * Scale shape: the dimension is broadcast — each executor hash-joins its
  * partitions locally, the firehose is never shuffled (contrast StreamJoin,
  * which must exchange both sides on user_id). At 100 TB/day of events and
  * a dimension in the tens of millions this is the plan you want: the only
  * data motion is the one-time dim broadcast per batch. A dimension too big
  * to broadcast flips to a shuffled join and THEN the stream pays an
  * exchange — the boundary the broadcast hint makes explicit here.
  */
object StreamEnrich {

  /** Per-user engagement tier from event volume — the static dimension.
    * Thresholds are integers over COUNT(*), so the tiering is exact and
    * relationally restatable by the oracle. */
  def userTiers(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"))
      .select(col("user_id"),
        when(col("n_ev") >= 20, "heavy")
          .when(col("n_ev") >= 10, "mid")
          .otherwise("light").as("tier"))

  /** Replay `events` through the broadcast-enrichment pipeline and return
    * the sink's final row set: every event annotated with its user's tier
    * ('unknown' for users absent from the dimension — exercised by
    * withholding users ≡ 0 (mod 17) from the written dim). */
  def run(spark: SparkSession, events: DataFrame, workDir: String,
          maxFilesPerTrigger: Int = 4): DataFrame =
    ReplayPerf.withFastCheckpoints(spark) {
    StreamJoin.writeDayChunkedParquet(spark, events, workDir, "ts")
    // the dimension is WRITTEN and re-read: the join's static side is a
    // storage relation (as in production), not an in-memory frame
    userTiers(events).filter(col("user_id") % 17 =!= 0)
      .write.parquet(s"$workDir/dim")
    val dim = spark.read.parquet(s"$workDir/dim")
    val src = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema(events.schema).parquet(s"$workDir/data")
    val enriched = src
      .join(broadcast(dim), Seq("user_id"), "left_outer")
      .select(col("user_id"), col("event_id"),
        coalesce(col("tier"), lit("unknown")).as("tier"), col("value"))
    val q = enriched.writeStream.format("parquet")
      .option("path", s"$workDir/sink")
      .option("checkpointLocation", s"$workDir/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow)
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$workDir/sink")
  }
}
