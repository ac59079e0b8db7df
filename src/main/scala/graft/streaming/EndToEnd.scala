package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.store.KeyedParquetTable

/** Oracle-grade end-to-end check of the resident streaming pipeline.
  *
  * The reference's full chain — HTTP poll drops envelope JSON → EventBridge
  * rule filters `Incoming Data` → Lambda unnests txs → Flink dedups by hash
  * and computes the 1-min window agg → put_record upserts by tx_minute
  * (ref: resources/services/ingestion-worker/lib.js:36-50,
  * resources/lambdas/stream_processing/main.py:31-69,
  * resources/flink/main.py:105-120,
  * resources/lambdas/delivery_stream_to_featurestore/main.py:54-62) —
  * replayed as a real multi-microbatch Structured Streaming run whose final
  * table state is reproducible by a batch SQL recomputation (the DuckDB
  * oracle).
  *
  * Fixture derivation from the deterministic `events` table:
  *   - tx hash   = md5(event_id)          (unique per event)
  *   - tx fee    = event_id % 10000       (integer → exact sums both engines)
  *   - tx time   = epoch seconds of ts    (second truncation never moves a
  *                                         row across a minute boundary)
  *   - envelope  = one 30 s poll window   (the reference polls every 15 s)
  *   - file      = one day of envelopes, boundary shifted +30 s past
  *                 midnight so the 00:00 minute window SPANS two files — its
  *                 aggregate is emitted in two microbatches and the second
  *                 (cumulative) upsert must win in the keyed table
  *   - dups      = every 7th event re-sent in the NEXT poll envelope (the
  *                 reference's overlapping last-100-txs polling) — crosses
  *                 file/batch boundaries, so dedup state must carry over
  *   - noise     = every 11th event also emitted under a `Health Check`
  *                 envelope with a DIFFERENT hash — if the S3 event-bus
  *                 filter failed these would inflate every count
  *
  * Files are replayed oldest-first (explicit modification times, ascending
  * with the data's event time), so with contiguous day chunks no on-time row
  * ever falls behind the 60 s watermark — the final table equals the clean
  * batch aggregate, which is exactly what the oracle recomputes.
  */
object EndToEnd {

  private val EnvelopeSeconds = 30L
  private val EnvelopesPerFile = 2880L // one day of 30 s polls

  /** Render `events` into time-ordered envelope fixture files under
    * `dir/data`. Returns the file count. */
  def writeFixtures(spark: SparkSession, events: DataFrame, dir: String): Int = {
    val base = events.select(
      md5(col("event_id").cast("string")).as("hash"),
      pmod(col("event_id"), lit(10000)).cast("int").as("fee"),
      unix_timestamp(col("ts")).as("time"),
      col("event_id"))
      .withColumn("env_id", expr(s"time div $EnvelopeSeconds"))

    val incoming = base.withColumn("detail_type", lit("Incoming Data"))
    // overlap duplicates: same tx re-polled one envelope later
    val dups = incoming.filter(pmod(col("event_id"), lit(7)) === 0)
      .withColumn("env_id", col("env_id") + 1)
    // health-check noise: distinct hashes that must never reach the agg
    val health = base.filter(pmod(col("event_id"), lit(11)) === 0)
      .withColumn("hash", md5(concat(lit("hc-"), col("event_id").cast("string"))))
      .withColumn("detail_type", lit("Health Check"))

    val envelopes = incoming.unionByName(dups).unionByName(health)
      .withColumn("tx", struct(col("hash"), col("fee"), col("time")))
      .groupBy(col("detail_type"), col("env_id"))
      .agg(collect_list(col("tx")).as("txs"))
      .select(
        expr(s"(env_id - 1) div $EnvelopesPerFile").as("chunk"),
        to_json(struct(
          col("detail_type").as("detail-type"),
          struct(col("txs")).as("detail"))).as("value"))

    // one shuffle, one write job: repartition by chunk so each day lands in
    // exactly one task → one file per chunk=… partition directory
    val stage = new Path(dir, "_stage")
    envelopes.repartition(col("chunk"))
      .write.partitionBy("chunk").text(stage.toString)

    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val data = new Path(dir, "data")
    fs.mkdirs(data)
    val chunks = fs.listStatus(stage).map(_.getPath)
      .filter(_.getName.startsWith("chunk="))
      .sortBy(p => p.getName.stripPrefix("chunk=").toLong) // bounded by #days
    chunks.zipWithIndex.foreach { case (cdir, i) =>
      fs.listStatus(cdir).map(_.getPath).filter(_.getName.startsWith("part-"))
        .zipWithIndex.foreach { case (part, j) =>
          val dest = new Path(data, f"chunk-$i%05d-$j.txt")
          fs.rename(part, dest)
          // explicit ascending mtimes: the file source replays oldest-first,
          // keeping arrival order aligned with event time (watermark safety)
          fs.setTimes(dest, 1600000000000L + i * 60000L, -1)
        }
    }
    fs.delete(stage, true)
    chunks.length
  }

  /** Replay the fixtures through the resident pipeline (multi-batch
    * AvailableNow) into a keyed table and return its latest state. */
  def run(spark: SparkSession, events: DataFrame, workDir: String,
          maxFilesPerTrigger: Int = 4): DataFrame = {
    writeFixtures(spark, events, workDir)
    val raw = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(s"$workDir/data")
    val table = new KeyedParquetTable(s"$workDir/table", "tx_minute")
    val query = Pipeline.writer(
      Pipeline.aggregates(raw), table, s"$workDir/ckpt", Trigger.AvailableNow)
      .start()
    query.awaitTermination()
    table.readLatest(spark)
      .select(col("tx_minute"), col("total_nb_trx_1min"),
        col("total_fee_1min"), col("avg_fee_1min"))
  }
}
