package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance-set observability (r14 opt, guide §1): split the e2e replay
  * queries' wall time into fixture render vs streaming replay vs sink read,
  * and time KeyedParquetTable phases for o6 — the phase split JobStats'
  * per-query totals cannot give.
  *
  * Usage: runMain graft.StreamProbe <sfDir>
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val ev = Tables.events(spark, sfDir)
    val work = java.nio.file.Files.createTempDirectory("streamprobe").toString

    // e2e_stream_join phase split: render-only vs full run
    t("join.render_only") {
      graft.streaming.StreamJoin.writeDayChunkedParquet(
        spark, ev.select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value")), s"$work/renderonly", "ts",
        daysPerChunk = 3)
    }
    t("join.full_run") {
      graft.streaming.StreamJoin.run(spark, ev, s"$work/full", daysPerChunk = 3)
        .count()
    }
    // warm second run (JIT paid) — the comparison baseline for the A/Bs
    t("join.full_run_warm") {
      graft.streaming.StreamJoin.run(spark, ev, s"$work/full2", daysPerChunk = 3)
        .count()
    }
    def scoped[A](kvs: (String, String)*)(f: => A): A = {
      val prev = kvs.map { case (key, _) => key -> spark.conf.getOption(key) }
      kvs.foreach { case (key, v) => spark.conf.set(key, v) }
      try f finally prev.foreach {
        case (key, Some(v)) => spark.conf.set(key, v)
        case (key, None) => spark.conf.unset(key)
      }
    }
    t("join.nochecksum") {
      scoped("spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false") {
        graft.streaming.StreamJoin.run(spark, ev, s"$work/nocksum", daysPerChunk = 3)
          .count()
      }
    }
    t("join.nochecksum2") {
      scoped("spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false") {
        graft.streaming.StreamJoin.run(spark, ev, s"$work/nocksum2", daysPerChunk = 3)
          .count()
      }
    }
    t("join.rocksdb") {
      scoped("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
        graft.streaming.StreamJoin.run(spark, ev, s"$work/rocks", daysPerChunk = 3)
          .count()
      }
    }
    t("join.minretain2") {
      scoped("spark.sql.streaming.minBatchesToRetain" -> "2") {
        graft.streaming.StreamJoin.run(spark, ev, s"$work/retain", daysPerChunk = 3)
          .count()
      }
    }
    t("join.bigtrigger") {
      scoped() {
        graft.streaming.StreamJoin.run(spark, ev, s"$work/bigtrig",
          maxFilesPerTrigger = 4, daysPerChunk = 3).count()
      }
    }
    // per-batch duration breakdown of one more run, via a progress listener
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        progress.add(s"batch=${e.progress.batchId} rows=${e.progress.numInputRows} " +
          s"durations=${e.progress.durationMs}")
        e.progress.stateOperators.foreach(so =>
          progress.add(s"  state op=${so.operatorName} rowsTotal=${so.numRowsTotal} " +
            s"updated=${so.numRowsUpdated} updMs=${so.allUpdatesTimeMs} " +
            s"removed=${so.numRowsRemoved} rmMs=${so.allRemovalsTimeMs} " +
            s"commitMs=${so.commitTimeMs} mem=${so.memoryUsedBytes} " +
            s"custom=${so.customMetrics}"))
      }
    }
    spark.streams.addListener(listener)
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stageListener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val dur = for {a <- i.completionTime; b <- i.submissionTime} yield a - b
        val m = i.taskMetrics
        stageLog.add(f"stage=${i.stageId}%4d tasks=${i.numTasks}%3d " +
          f"dur=${dur.getOrElse(-1L)}%5dms runSum=${m.executorRunTime}%6dms " +
          f"cpuSum=${m.executorCpuTime / 1000000}%6dms gc=${m.jvmGCTime}%5dms " +
          f"deserSum=${m.executorDeserializeTime}%5dms ${i.name.takeWhile(_ != '(')}")
      }
    }
    spark.sparkContext.addSparkListener(stageListener)
    t("join.instrumented") {
      graft.streaming.StreamJoin.run(spark, ev, s"$work/instr", daysPerChunk = 3)
        .count()
    }
    spark.sparkContext.removeSparkListener(stageListener)
    spark.streams.removeListener(listener)
    progress.forEach(p => println(s"PROGRESS $p"))
    stageLog.forEach(p => println(s"STAGE $p"))

    // o6 phase split
    val table = new graft.store.KeyedParquetTable(s"$work/o6table", "tx_minute")
    def minuteAgg(df: org.apache.spark.sql.DataFrame, v: Double) =
      graft.batch.MinuteAggregate(df, "ts", "value")
        .withColumn("event_time", lit(v))
    t("o6.upsert1") {
      table.upsert(minuteAgg(ev.filter(pmod(col("event_id"), lit(2)) === 0), 0.0),
        0, bulk = true)
    }
    t("o6.upsert2") { table.upsert(minuteAgg(ev, 1.0), 1, bulk = true) }
    t("o6.compact") { table.compact(spark, targetFileBytes = Long.MaxValue) }
    t("o6.filecounts") { table.hourPrefixFileCounts(spark).size }
    t("o6.readLatest_agg") {
      table.readLatest(spark)
        .groupBy(substring(col("tx_minute"), 1, 13).as("hour_prefix"))
        .agg(count(lit(1)).as("n_minutes")).count()
    }
    spark.stop()
  }
}
