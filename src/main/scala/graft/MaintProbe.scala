package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.batch.MinuteAggregate

/** Phase-level profiler for the batch maintenance fixtures (guide §1):
  * replays o6_compact_files' exact body with a wall-clock timer around each
  * phase (two bulk upserts, compact, the driver-side file-count listing,
  * the latest-wins content rollup) so the 30 s bench row can be attributed
  * to write-side vs read-side vs driver-listing cost before anything is
  * changed. Observability tooling only — never on a timed path.
  *
  * Usage: runMain graft.MaintProbe [sfDir]
  */
object MaintProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // A/B knobs for the write-side wall (forked chmod per file create on
    // RawLocalFileSystem without Hadoop native IO; ChecksumFileSystem
    // doubles the creates with .crc sidecars a cluster FS never writes):
    //   MAINT_RAWFS=1      file:// bypasses ChecksumFileSystem (no .crc)
    //   MAINT_COMMITV2=1   FileOutputCommitter algorithm 2 (one rename)
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val b1 = if (sys.env.get("MAINT_RAWFS").contains("1"))
      b0.config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    else b0
    val b2 = if (sys.env.get("MAINT_COMMITV2").contains("1"))
      b1.config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    else b1
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val work = java.nio.file.Files.createTempDirectory("maintprobe").toString
      val table = new graft.store.KeyedParquetTable(s"$work/table", "tx_minute")
      val ev = Tables.events(spark, sfDir)
      def minuteAgg(df: org.apache.spark.sql.DataFrame, v: Double) =
        MinuteAggregate(df, "ts", "value").withColumn("event_time", lit(v))
      phase("upsert_half")(table.upsert(
        minuteAgg(ev.filter(pmod(col("event_id"), lit(2)) === 0), 0.0), 0, bulk = true))
      phase("upsert_full")(table.upsert(minuteAgg(ev, 1.0), 1, bulk = true))
      phase("compact")(table.compact(spark, targetFileBytes = Long.MaxValue))
      val files = phase("file_counts")(
        spark.createDataFrame(table.hourPrefixFileCounts(spark))
          .toDF("hour_prefix", "n_files"))
      phase("content_rollup") {
        val content = table.readLatest(spark)
          .groupBy(substring(col("tx_minute"), 1, 13).as("hour_prefix"))
          .agg(count(lit(1)).as("n_minutes"), sum(col("total_nb_trx_1min")).as("total_trx"))
        files.join(content, "hour_prefix").count()
      }
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(work))
    }
    spark.stop()
  }
}
