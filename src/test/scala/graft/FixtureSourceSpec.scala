package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.streaming.Trigger
import graft.store.KeyedParquetTable
import graft.streaming.{Pipeline, SourceAdapters}

/** S1 — the fixture-directory source driving the full pipeline end-to-end:
  * each file is one "poll" of envelope JSON, streamed with
  * maxFilesPerTrigger=1 the way the 15 s poll cadence bounds ingest. */
class FixtureSourceSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1786525200L // 2026-08-12 09:00:00 UTC

  private def tx(hash: String, fee: Int, time: Long): String =
    s"""{"hash":"$hash","ver":1,"vin_sz":1,"vout_sz":1,"size":1,"weight":1,"fee":$fee,
       |"relayed_by":"","lock_time":0,"tx_index":1,"double_spend":false,"time":$time,
       |"block_index":null,"block_height":null,"inputs":"[]","out":"[]","rbf":false}"""
      .stripMargin.replaceAll("\n", "")

  private def envelope(txs: Seq[String]): String =
    s"""{"version":0,"id":"u","detail-type":"Incoming Data","source":"w","account":1,
       |"time":"t","region":"r","resources":[],"detail":{"txs":[${txs.mkString(",")}]}}"""
      .stripMargin.replaceAll("\n", "")

  test("file-per-poll fixtures flow through unnest→dedup→agg→upsert") {
    val in = tmpDir("polls")
    // poll 1: two txs in minute 0; poll 2: dup of tx a + one tx in minute 1
    Files.writeString(Paths.get(s"$in/poll1.json"),
      envelope(Seq(tx("a", 10, base + 5), tx("b", 20, base + 20))))
    Files.writeString(Paths.get(s"$in/poll2.json"),
      envelope(Seq(tx("a", 10, base + 5), tx("c", 30, base + 70))))

    val table = new KeyedParquetTable(tmpDir("agg"), "tx_minute")
    val raw = SourceAdapters.fixtureDirectory(spark, in, maxFilesPerTrigger = 1)
    val q = Pipeline.writer(Pipeline.aggregates(raw), table, tmpDir("ckpt"),
      Trigger.AvailableNow()).start()
    try q.awaitTermination(120000L) finally q.stop()

    val out = table.readLatest(spark)
      .select($"tx_minute", $"total_nb_trx_1min", $"total_fee_1min")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("2026-08-12 09:00:00") === ((2L, 30L)), "dup hash admitted once")
    assert(out("2026-08-12 09:01:00") === ((1L, 30L)))
  }

  test("checkpoint recovery: dedup and window state survive a restart") {
    val in = tmpDir("polls2")
    val ckpt = tmpDir("ckpt2")
    val table = new KeyedParquetTable(tmpDir("agg2"), "tx_minute")
    def run(): Unit = {
      val raw = SourceAdapters.fixtureDirectory(spark, in, maxFilesPerTrigger = 1)
      val q = Pipeline.writer(Pipeline.aggregates(raw), table, ckpt,
        Trigger.AvailableNow()).start()
      try q.awaitTermination(120000L) finally q.stop()
    }
    Files.writeString(Paths.get(s"$in/p1.json"),
      envelope(Seq(tx("x", 10, base + 5), tx("y", 20, base + 30))))
    run()
    // second run, NEW query instance on the same checkpoint: dup of "x" must
    // still be dropped (dedup state restored), window must accumulate
    Files.writeString(Paths.get(s"$in/p2.json"),
      envelope(Seq(tx("x", 10, base + 5), tx("z", 5, base + 40))))
    run()
    val m0 = table.readLatest(spark)
      .filter($"tx_minute" === "2026-08-12 09:00:00")
      .select($"total_nb_trx_1min", $"total_fee_1min").as[(Long, Long)].head()
    assert(m0 === ((3L, 35L)), "x deduped across restart; z accumulated into restored window")
  }
}
