package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamTws

/** transformWithState replay vs the direct batch aggregate: the processor's
  * integer state arithmetic makes the final per-user snapshot a pure
  * function of the row set, so the two must match exactly at sf0.001. */
class StreamTwsSpec extends SparkSpec {

  test("transformWithState running profile equals batch aggregate (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, dir)
    val streamed = StreamTws.run(spark, events, tmpDir("tws"))

    val expected = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        sum(col("value").cast("decimal(30,2)")).cast("double").as("sum_value"),
        unix_micros(min(col("ts"))).as("first_ts_us"),
        unix_micros(max(col("ts"))).as("last_ts_us"))

    assert(streamed.count() === expected.count(),
      "one final snapshot per user")
    val diff = streamed.except(expected).union(expected.except(streamed))
    assert(diff.isEmpty, s"profiles diverge:\n${diff.limit(5).collect().mkString("\n")}")
  }

  test("snapshot monotonicity: multiple batches per key, latest wins") {
    // 1 file/trigger forces ≥2 micro-batches over the 7-day fixture, so at
    // least some users emit multiple snapshots; run() must keep the max-n one.
    val dir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, dir).filter(col("user_id") < 10)
    val streamed = StreamTws.run(spark, events, tmpDir("tws2"), maxFilesPerTrigger = 1)
    val expected = events.groupBy(col("user_id")).count()
    assert(streamed.select(col("user_id"), col("n_events")).collect().toSet ===
      expected.select(col("user_id"), col("count")).collect().toSet)
  }
}
