package graft

import org.apache.spark.sql.functions._
import graft.streaming.EndToEnd

/** Oracle-shaped check of the full streaming replay at sf0.001: the final
  * keyed-table state must equal an independent batch recomputation over the
  * raw events (duplicates removed by stream dedup, health-check noise by the
  * event-bus filter — neither may leak into the aggregates). */
class EndToEndSpec extends SparkSpec {

  test("streaming replay equals clean batch aggregate (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, dir)
    val streamed = EndToEnd.run(spark, events, tmpDir("e2e"), maxFilesPerTrigger = 4)

    val expected = events
      .groupBy(date_format(date_trunc("minute", col("ts")), "yyyy-MM-dd HH:mm:ss")
        .as("tx_minute"))
      .agg(count(lit(1)).as("total_nb_trx_1min"),
        sum(pmod(col("event_id"), lit(10000)).cast("int")).as("total_fee_1min"),
        avg(pmod(col("event_id"), lit(10000)).cast("int")).as("avg_fee_1min"))

    assert(streamed.count() === expected.count())
    assert(streamed.except(expected).isEmpty && expected.except(streamed).isEmpty)
  }
}
