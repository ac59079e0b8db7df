package graft

import org.apache.spark.sql.functions._
import graft.ops.DedupOps
import graft.streaming.{EndToEnd, StreamNearDup}

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
