package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.streaming.Trigger
import graft.api.Engine
import graft.batch.NaiveForecaster

/** The full reference lifecycle through the Engine facade: ingest →
  * read → export → monitor → alarm → threshold update. */
class EngineSpec extends SparkSpec {
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

  test("lifecycle: ingest, read latest, export splits, monitor, threshold") {
    val engine = Engine(spark, tmpDir("wh"), predictionLength = 2, numValidationWindows = 2)
    val polls = tmpDir("polls")
    // 40 minutes of data, one tx per minute
    (0 until 40).grouped(10).zipWithIndex.foreach { case (chunk, i) =>
      Files.writeString(Paths.get(s"$polls/poll$i.json"),
        envelope(chunk.map(m => tx(s"h$m", 100 + m, base + m * 60L + 5))))
    }
    val q = engine.startIngestion(engine.envelopesFromDirectory(polls, 2),
      Trigger.AvailableNow())
    try q.awaitTermination(120000L) finally q.stop()

    val series = engine.series()
    assert(series.count() === 40)
    val first = series.select("avg_fee_1min").as[Double].head()
    assert(first === 100.0)

    val b = engine.exportTrainingData(tmpDir("deepar"))
    assert(b.trainLen === 40 - 2 - 2 * 2)

    val m = engine.monitor(new NaiveForecaster, threshold = 0.001)
    // naive forecast carries value at minute 37 (=137); truth 138, 139
    assert(m.rmse > 0 && m.breached)
    val alarms = engine.alarms(threshold = 0.001, k = 1)
    assert(alarms.filter($"alarm" === 1).count() === 1)

    assert(math.abs(engine.nextThreshold(0.1, 0.24) - 0.17) < 1e-12)
  }
}
