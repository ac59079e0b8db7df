package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream interval join, replayed end to end (the §2.8 companion of
  * EndToEnd's windowed-aggregation replay): clicks and errors are two
  * event-bus subscriptions of the same firehose (the reference's
  * EventBridge pattern — one bus, per-consumer filter rules), joined per
  * user on a bounded event-time interval with watermarks on both sides.
  *
  * Correctness contract: with fixtures replayed in event-time order
  * (day-chunked files, ascending modification times — the EndToEnd
  * discipline), every qualifying pair is matched before state eviction and
  * the append-mode sink holds EXACTLY the batch join's row set, which is
  * what the DuckDB oracle recomputes. Why eviction can't race arrival: the
  * interval condition bounds err_ts in BOTH directions relative to
  * click_ts, so Spark derives a state TTL for each side; the global
  * watermark lags one batch behind the ordered replay, so when a click at
  * t_c arrives the watermark is ≤ t_c − 60 s, strictly before the eviction
  * point t_e + window ≥ t_c of any error it may still match.
  *
  * Scale shape: the join itself is a keyed-state symmetric hash join —
  * both sides shuffle once on user_id, per-key state is bounded by the
  * interval width × per-user rate, and eviction is watermark-driven. At
  * 100 TB/day this is the shape that works: no unbounded state, no
  * re-scan, one exchange per side.
  */
object StreamJoin {

  /** Render `df` into day-chunked parquet fixture files under `dir/data`
    * with ascending modification times (file source replays oldest-first —
    * arrival order tracks event time, the watermark-safety precondition).
    * `daysPerChunk > 1` coarsens the chunking (r10 verdict task 3: replay
    * wall time is trigger-count-bound, not row-bound) — every ordering and
    * eviction-safety argument that holds for day chunks holds a fortiori
    * for larger ones (fewer, strictly later batch boundaries); only ops
    * whose correctness bounds the original→copy ARRIVAL gap from above
    * (StreamDedupReplay's 48 h vs ≤1 day) must keep daysPerChunk = 1.
    * `arrivalCol` (round 13): chunk on a SEPARATE arrival-time column
    * instead of the event-time column — the out-of-order fixture shape
    * (rows whose replay position trails their event time); the column is
    * consumed by the chunking and never reaches the data files.
    * Returns the chunk count. */
  def writeDayChunkedParquet(spark: SparkSession, df: DataFrame, dir: String,
                             tsCol: String, daysPerChunk: Int = 1,
                             arrivalCol: Option[String] = None): Int = {
    val stage = new Path(dir, "_stage")
    val chunkSrc = arrivalCol.getOrElse(tsCol)
    df.withColumn("chunk", expr(s"unix_timestamp($chunkSrc) div ${86400L * daysPerChunk}"))
      .drop(arrivalCol.toSeq: _*)
      .repartition(col("chunk"))
      .write.partitionBy("chunk").parquet(stage.toString)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val data = new Path(dir, "data")
    fs.mkdirs(data)
    val chunks = fs.listStatus(stage).map(_.getPath)
      .filter(_.getName.startsWith("chunk="))
      .sortBy(p => p.getName.stripPrefix("chunk=").toLong)
    chunks.zipWithIndex.foreach { case (cdir, i) =>
      fs.listStatus(cdir).map(_.getPath).filter(_.getName.startsWith("part-"))
        .zipWithIndex.foreach { case (part, j) =>
          val dest = new Path(data, f"chunk-$i%05d-$j.parquet")
          fs.rename(part, dest)
          fs.setTimes(dest, 1600000000000L + i * 60000L, -1)
        }
    }
    fs.delete(stage, true)
    chunks.length
  }

  /** Replay `events` through the two-subscription interval join and return
    * the sink's final row set: for each click, every error of the same
    * user in the `windowSeconds` before it (inclusive).
    *
    * Two independent readStreams over the same fixture dir — the
    * event-bus-with-two-rules topology, and also the robust Spark form (a
    * filtered self-join of one source shares one set of file offsets;
    * separate sources keep per-side progress independent). */
  def run(spark: SparkSession, events: DataFrame, workDir: String,
          windowSeconds: Long = 21600L,
          maxFilesPerTrigger: Int = 4,
          daysPerChunk: Int = 1): DataFrame =
    ReplayPerf.withFastCheckpoints(spark) {
    writeDayChunkedParquet(spark, events, workDir, "ts", daysPerChunk)
    val schema = events.schema
    def source() = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema(schema).parquet(s"$workDir/data")
    val clicks = source().filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"), col("value").as("click_value"))
      .withWatermark("click_ts", "60 seconds")
    val errors = source().filter(col("event_type") === "error")
      .select(col("user_id").as("err_user_id"), col("event_id").as("err_id"),
        col("ts").as("err_ts"))
      .withWatermark("err_ts", "60 seconds")
    val joined = clicks.join(errors,
      col("user_id") === col("err_user_id") &&
        col("err_ts") >= col("click_ts") - expr(s"INTERVAL $windowSeconds SECONDS") &&
        col("err_ts") <= col("click_ts"))
    val q = joined
      .select(col("user_id"), col("click_id"), col("err_id"),
        unix_micros(col("click_ts")).as("click_t_us"),
        unix_micros(col("err_ts")).as("err_t_us"), col("click_value"))
      .writeStream.format("parquet")
      .option("path", s"$workDir/sink")
      .option("checkpointLocation", s"$workDir/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow)
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$workDir/sink")
  }

  /** LEFT OUTER variant of [[run]] — the semantics twin whose hard part is
    * the NULL side: an unmatched click can only be emitted (err_id NULL)
    * when the watermark proves no qualifying error can still arrive, i.e.
    * at state eviction — so outer results trail the inner ones by the
    * interval width, and the trailing clicks of the whole replay would
    * stay unemitted forever behind the final watermark (it stops 60 s
    * short of max ts). The StreamSession sentinel discipline seals them —
    * but here the watermark is the MIN across both sides, and each side
    * computes its own from the rows passing ITS event-type filter, so ONE
    * sentinel advances one side only and the global watermark stays
    * pinned: a sentinel PAIR (one click, one error, 2 days past max ts)
    * is required. Their own rows never seal (nothing ever passes their
    * eviction point) and are excluded by the user_id ≥ 0 read-back filter.
    *
    * Contract: sink = the batch LEFT JOIN row set exactly — every click
    * appears, matched rows with their err_id, unmatched ones once with
    * NULL. Same eviction-vs-arrival ordering argument as [[run]]. */
  def runLeftOuter(spark: SparkSession, events: DataFrame, workDir: String,
                   windowSeconds: Long = 21600L,
                   maxFilesPerTrigger: Int = 4,
                   daysPerChunk: Int = 1): DataFrame =
    ReplayPerf.withFastCheckpoints(spark) {
    import spark.implicits._
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    val far = new java.sql.Timestamp(maxTs.getTime + 2L * 86400L * 1000L)
    val sentinels = Seq((-1L, far, -1L, "click", 0.0, "{}"),
        (-2L, far, -2L, "error", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val evs = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"), col("props"))
    writeDayChunkedParquet(spark, evs.unionByName(sentinels), workDir, "ts",
      daysPerChunk)
    val schema = evs.schema
    def source() = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema(schema).parquet(s"$workDir/data")
    val clicks = source().filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "60 seconds")
    val errors = source().filter(col("event_type") === "error")
      .select(col("user_id").as("err_user_id"), col("event_id").as("err_id"),
        col("ts").as("err_ts"))
      .withWatermark("err_ts", "60 seconds")
    val joined = clicks.join(errors,
      col("user_id") === col("err_user_id") &&
        col("err_ts") >= col("click_ts") - expr(s"INTERVAL $windowSeconds SECONDS") &&
        col("err_ts") <= col("click_ts"),
      "left_outer")
    val q = joined
      .select(col("user_id"), col("click_id"), col("err_id"),
        unix_micros(col("click_ts")).as("click_t_us"))
      .writeStream.format("parquet")
      .option("path", s"$workDir/sink")
      .option("checkpointLocation", s"$workDir/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow)
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$workDir/sink").filter(col("user_id") >= 0)
  }
}
