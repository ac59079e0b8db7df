package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Incremental

/** Streaming ADDITIVE view maintenance — the streaming form of o23's
  * incremental materialized view, and the seventh §2.8 replay.
  *
  * The resident windowed aggregate (e2e_stream_agg) holds its open windows
  * in STREAM state and seals them with a watermark — the right shape when a
  * key's lifetime is one window. An all-time per-key aggregate ("events per
  * user, ever") has unbounded key lifetime: windowed state would grow
  * forever. This operator keeps ZERO stream state instead — each
  * micro-batch appends its mergeable (n, exact-decimal-sum) PARTIAL
  * ([[graft.ops.Incremental.partial]]) as an epoch dir of the view table;
  * the additive merge algebra makes the table itself the state.
  *
  * Exactly-once without sinks or transactions:
  *   - a batch OVERWRITES its own `__b=<batchId>` epoch, so a replayed
  *     (crash-recovered) batch re-lands instead of double-counting;
  *   - cadence compaction ([[compactMerge]]) merges only epochs
  *     `<= batchId - 1` — those batches are checkpoint-COMMITTED (the file
  *     source commits batch N before starting N+1), so no replayable epoch
  *     is ever consumed. Merged rows land in a NEGATIVE, strictly
  *     decreasing epoch (the [[StreamNearDup.compactEpochs]] convention)
  *     that can never collide with a batchId.
  *   - remaining crash window: between the compaction rewrite and the
  *     consumed-dir deletes, a reader would double-count the merged span —
  *     the swap a table format makes atomic with a manifest commit; serial
  *     AvailableNow replays (this harness) never observe it.
  *
  * Scale shape: per batch one narrow partial-agg (map-side combined to at
  * most |keys| rows) and one metadata-sized append; compaction shuffles
  * view rows, never event rows. Serving reads collapse the ≤ compactEvery
  * surviving epochs with one keyed merge.
  */
object StreamView {

  private[streaming] def writeEpoch(df: DataFrame, path: String, epoch: Long): Unit = {
    val dir = new Path(path, s"__b=$epoch")
    val fs = dir.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    df.withColumn("__b", lit(epoch))
      .write.mode(SaveMode.Append).partitionBy("__b").parquet(path)
  }

  /** Merge every epoch dir with id <= `upTo` (committed batches and prior
    * maintenance epochs) into one negative maintenance epoch, deleting the
    * consumed dirs. Must run serially with the writer (holds inside
    * foreachBatch). */
  def compactMerge(spark: SparkSession, path: String, keyNames: Seq[String],
                   upTo: Long): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val dirs = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__b="))
      .map(_.getPath)
      .filter(_.getName.stripPrefix("__b=").toLong <= upTo).toSeq
    if (dirs.size <= 1) return
    val epochs = dirs.map(_.getName.stripPrefix("__b=").toLong)
    val newEpoch = math.min(-1L, epochs.min - 1L)
    val merged = Incremental.merge(
      Seq(spark.read.parquet(path).filter(col("__b") <= upTo).drop("__b")),
      keyNames)
    writeEpoch(merged, path, newEpoch)
    dirs.foreach(d => fs.delete(d, true))
  }

  /** Replay `events` day-chunked through the additive-view pipeline and
    * return the served view (user_id, n, s). Asserts the replay really ran
    * multiple micro-batches — a single-batch run would pass vacuously. */
  def run(spark: SparkSession, events: DataFrame, workDir: String,
          maxFilesPerTrigger: Int = 4, compactEvery: Int = 3): DataFrame = {
    val evs = events.select(col("user_id"), col("value"), col("ts"))
    StreamJoin.writeDayChunkedParquet(spark, evs, workDir, "ts")
    val viewPath = s"$workDir/view"

    val src = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema(evs.schema).parquet(s"$workDir/data")

    val nBatches = spark.sparkContext.longAccumulator("view_batches")
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        nBatches.add(1)
        val partial = Incremental.partial(batch, Seq(col("user_id")), col("value"))
        writeEpoch(partial, viewPath, id)
        if (compactEvery > 0 && id % compactEvery == compactEvery - 1)
          compactMerge(batch.sparkSession, viewPath, Seq("user_id"), id - 1)
      }
      .option("checkpointLocation", s"$workDir/ckpt")
      .trigger(Trigger.AvailableNow)
      .start()
    q.awaitTermination()
    require(nBatches.value > 1,
      s"replay collapsed into ${nBatches.value} micro-batch(es); the " +
        "cross-batch merge is the point of the streaming form")
    Incremental.merge(
      Seq(spark.read.parquet(viewPath).drop("__b")), Seq("user_id"))
  }
}
