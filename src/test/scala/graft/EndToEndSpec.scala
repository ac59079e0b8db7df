package graft

import org.apache.spark.sql.functions._
import graft.ops.DedupOps
import graft.streaming.{EndToEnd, StreamJoin, StreamNearDup}

/** Oracle-shaped check of the full streaming replay at sf0.001: the final
  * keyed-table state must equal an independent batch recomputation over the
  * raw events (duplicates removed by stream dedup, health-check noise by the
  * event-bus filter — neither may leak into the aggregates). */
class EndToEndSpec extends SparkSpec {

  test("streaming replay equals clean batch aggregate (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, dir)
    val streamed = EndToEnd.run(spark, events, tmpDir("e2e"), maxFilesPerTrigger = 4,
      withAuxSinks = true)

    val expected = events
      .groupBy(date_format(date_trunc("minute", col("ts")), "yyyy-MM-dd HH:mm:ss")
        .as("tx_minute"))
      .agg(count(lit(1)).as("total_nb_trx_1min"),
        sum(pmod(col("event_id"), lit(10000)).cast("int")).as("total_fee_1min"),
        avg(pmod(col("event_id"), lit(10000)).cast("int")).as("avg_fee_1min"))

    assert(streamed.count() === expected.count())
    assert(streamed.except(expected).isEmpty && expected.except(streamed).isEmpty)
  }

  test("stream-stream interval join replay equals the batch join (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, dir)
    val streamed = StreamJoin.run(spark, events, tmpDir("e2ej"))
      .select(col("click_id"), col("err_id"))

    val c = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"))
    val e = events.filter(col("event_type") === "error")
      .select(col("user_id").as("eu"), col("event_id").as("err_id"), col("ts").as("ets"))
    val expected = c.join(e,
      col("user_id") === col("eu") &&
        col("ets") >= col("cts") - expr("INTERVAL 21600 SECONDS") &&
        col("ets") <= col("cts"))
      .select(col("click_id"), col("err_id"))

    assert(expected.count() > 0, "fixture must produce at least one pair")
    assert(streamed.count() === expected.count(),
      "append sink must hold each qualifying pair exactly once")
    assert(streamed.except(expected).isEmpty && expected.except(streamed).isEmpty)
  }

  test("session-window replay equals batch sessionization; boundary-spanning sessions merge") {
    import spark.implicits._
    // user 1: one session SPANNING the day-1/day-2 fixture boundary (last
    // day-1 event 10 min before midnight, first day-2 event 10 min after —
    // within the 30 min gap, so the day-2 batch must merge into the day-1
    // session still held in state); plus a separate later session.
    // user 2: single-event sessions far apart.
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, t("2024-03-01 10:00:00"), 1.0), (1L, t("2024-03-01 23:50:00"), 2.0),
      (1L, t("2024-03-02 00:10:00"), 4.0), (1L, t("2024-03-02 12:00:00"), 8.0),
      (2L, t("2024-03-01 09:00:00"), 16.0), (2L, t("2024-03-03 09:00:00"), 32.0))
      .toDF("user_id", "ts", "value")
    val streamed = graft.streaming.StreamSession
      .run(spark, events, tmpDir("e2es_spec"), maxFilesPerTrigger = 1)
      .select($"user_id", $"session_start_us", $"n_events", $"sum_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    def us(s: String) = t(s).getTime * 1000L
    assert(streamed === Set(
      (1L, us("2024-03-01 10:00:00"), 1L, 1.0),
      (1L, us("2024-03-01 23:50:00"), 2L, 6.0), // merged across the batch boundary
      (1L, us("2024-03-02 12:00:00"), 1L, 8.0),
      (2L, us("2024-03-01 09:00:00"), 1L, 16.0),
      (2L, us("2024-03-03 09:00:00"), 1L, 32.0)),
      "sink must hold exactly the batch sessionization, sentinel excluded")
  }

  test("streaming CDC: cross-batch state suppresses unchanged values, ties order by event_id") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1 "temp": 5.0 on day 1, SAME 5.0 on day 2 (different batch —
    // state must suppress), 7.0 later on day 2 (emit), back to 5.0 on day
    // 3 (emit: change detection, not a seen-set). user 2: same-timestamp
    // tie resolved by event_id (1.0 then 2.0 → both emit, in that order).
    val events = Seq(
      (1L, "temp", 5.0, t("2024-03-01 10:00:00"), 10L),
      (1L, "temp", 5.0, t("2024-03-02 10:00:00"), 20L),
      (1L, "temp", 7.0, t("2024-03-02 11:00:00"), 30L),
      (1L, "temp", 5.0, t("2024-03-03 10:00:00"), 40L),
      (2L, "temp", 1.0, t("2024-03-01 10:00:00"), 1L),
      (2L, "temp", 2.0, t("2024-03-01 10:00:00"), 2L))
      .toDF("user_id", "event_type", "value", "ts", "event_id")
    val out = graft.streaming.StreamCdc
      .run(spark, events, tmpDir("e2ecdc_spec"), maxFilesPerTrigger = 1)
      .select($"user_id", $"value", $"valid_from_us")
      .as[(Long, Double, Long)].collect().toSet
    def us(s: String) = t(s).getTime * 1000L
    assert(out === Set(
      (1L, 5.0, us("2024-03-01 10:00:00")),
      (1L, 7.0, us("2024-03-02 11:00:00")),
      (1L, 5.0, us("2024-03-03 10:00:00")),
      (2L, 1.0, us("2024-03-01 10:00:00")),
      (2L, 2.0, us("2024-03-01 10:00:00"))),
      "unchanged cross-batch value must not re-emit; value flapping must")
  }

  test("late arrivals beyond the 60s watermark are discarded (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, dir)
    // day files, 2 files/trigger, arrivals delayed 6 files: the late-events
    // filter uses the watermark from one batch BEFORE arrival, so the delay
    // must clear two batch-groups plus that lag (EndToEnd late-variant doc)
    val streamed = EndToEnd.run(spark, events, tmpDir("e2e_late"),
      maxFilesPerTrigger = 2, envelopesPerFile = 2880L, lateDelayFiles = 6)

    val maxTime = events.agg(max(unix_timestamp(col("ts")))).first().getLong(0)
    val late = pmod(col("event_id"), lit(13)) === 0 &&
      pmod(col("event_id"), lit(7)) =!= 0 &&
      unix_timestamp(col("ts")) < lit(maxTime - 3600L)
    assert(events.filter(late).count() > 0, "late subset must be non-empty")

    val expected = events.filter(!late)
      .groupBy(date_format(date_trunc("minute", col("ts")), "yyyy-MM-dd HH:mm:ss")
        .as("tx_minute"))
      .agg(count(lit(1)).as("total_nb_trx_1min"),
        sum(pmod(col("event_id"), lit(10000)).cast("int")).as("total_fee_1min"),
        avg(pmod(col("event_id"), lit(10000)).cast("int")).as("avg_fee_1min"))

    // the drop is material: fewer txs than the no-late replay would count
    val totalTx = streamed.agg(sum("total_nb_trx_1min")).first().getLong(0)
    assert(totalTx === events.filter(!late).count())
    assert(totalTx < events.count())
    assert(streamed.except(expected).isEmpty && expected.except(streamed).isEmpty)
  }

  test("quiet stream: open mid-minute window surfaces through the update-mode upsert") {
    // The reference Flink job needs an explicit idle-timeout
    // (resources/flink/main.py:34) or a quiet stream leaves the last window
    // unflushed forever. Our mitigation is structural: update-mode emission
    // + keyed upsert — every batch upserts the CURRENT value of every
    // updated window, so a window whose watermark never closes (stream went
    // idle mid-minute, no later event to advance it) is still visible, and
    // a later resume upserts the cumulative value over it.
    import graft.store.KeyedParquetTable
    import graft.streaming.Pipeline
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.{Files, Paths}

    val work = tmpDir("quiet")
    Files.createDirectories(Paths.get(s"$work/data"))
    val t0 = 1700000000L - (1700000000L % 60) // minute-aligned epoch
    def envelope(txs: Seq[(String, Int, Long)]): String =
      s"""{"detail-type":"Incoming Data","detail":{"txs":[""" +
        txs.map { case (h, f, t) => s"""{"hash":"$h","fee":$f,"time":$t}""" }
          .mkString(",") + "]}}"
    def writeFile(name: String, lines: Seq[String], mtime: Long): Unit = {
      val p = Paths.get(s"$work/data/$name")
      Files.write(p, lines.mkString("\n").getBytes)
      p.toFile.setLastModified(mtime)
    }
    def minuteKey(epochSec: Long): String =
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochSecond(epochSec / 60 * 60))

    // phase 1 — the stream goes idle 20 s into minute 1: its window can
    // never close (watermark needs an event past t0+180 to pass t0+120)
    writeFile("f0.txt", Seq(envelope(Seq(("a", 10, t0 + 5), ("b", 20, t0 + 10), ("c", 30, t0 + 20)))), 1600000000000L)
    writeFile("f1.txt", Seq(envelope(Seq(("d", 40, t0 + 65), ("e", 50, t0 + 80)))), 1600000060000L)
    val table = new KeyedParquetTable(s"$work/table", "tx_minute")
    def replay(): Unit = {
      val raw = spark.readStream.option("maxFilesPerTrigger", 1).text(s"$work/data")
      Pipeline.writer(Pipeline.aggregates(raw), table, s"$work/ckpt", Trigger.AvailableNow)
        .start().awaitTermination()
    }
    replay()
    val state1 = table.readLatest(spark)
      .select("tx_minute", "total_nb_trx_1min", "total_fee_1min").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(state1(minuteKey(t0)) === ((3L, 60L)))
    assert(state1(minuteKey(t0 + 60)) === ((2L, 90L)),
      "open window must be visible while the stream is idle")

    // phase 2 — the stream resumes: the still-open minute-1 window grows and
    // the cumulative upsert must win over the phase-1 value
    writeFile("f2.txt", Seq(envelope(Seq(("f", 60, t0 + 100), ("g", 70, t0 + 125)))), 1600000120000L)
    replay()
    val state2 = table.readLatest(spark)
      .select("tx_minute", "total_nb_trx_1min", "total_fee_1min").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(state2(minuteKey(t0)) === ((3L, 60L)))
    assert(state2(minuteKey(t0 + 60)) === ((3L, 150L)),
      "resumed stream must upsert the cumulative window value")
    assert(state2(minuteKey(t0 + 120)) === ((1L, 70L)))
  }

  test("streaming near-dup converges to the batch LSH pair set (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val streamed = StreamNearDup.run(spark, docs, tmpDir("e2e_neardup"),
      numFiles = 8, maxFilesPerTrigger = 2)
    val batch = DedupOps.lshCandidatePairs(docs, "doc_id", "text", 16, 4)
    assert(batch.count() > 0, "fixture corpus must contain LSH candidate pairs")
    // exact set equality INCLUDING multiplicity: a double emission (replay
    // or band-join bug) must fail the count, not vanish into except()
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }
}
