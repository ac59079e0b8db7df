package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.streaming.Trigger
import graft.store.KeyedParquetTable
import graft.streaming.{EnvelopePoller, Fetcher, HttpFetcher, Pipeline, SourceAdapters}

/** S1 production path: a real HTTP poll loop against a local stub server,
  * landing envelope files that the streaming pipeline consumes. Zero egress —
  * the server is a JDK HttpServer on loopback. */
class HttpPollerSpec extends SparkSpec {

  private def tx(hash: String, fee: Int, time: Long): String =
    s"""{"hash":"$hash","fee":$fee,"time":$time}"""

  private def withServer(body: String)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/feed", exchange => {
      val bytes = body.getBytes(UTF_8)
      exchange.sendResponseHeaders(200, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/feed")
    finally server.stop(0)
  }

  test("poll → land → stream → aggregate, end to end against a stub server") {
    val base = 1786525200L // 2026-08-12 09:00:00 UTC
    val feed = s"""{"txs":[${tx("a", 100, base + 10)},${tx("b", 200, base + 20)}]}"""
    withServer(feed) { url =>
      val landing = tmpDir("landing")
      val poller = new EnvelopePoller(new HttpFetcher(url), landing, source = "test")
      assert(poller.pollOnce().isDefined)
      assert(poller.pollOnce().isDefined) // second poll re-sends the feed (dup txs)
      assert(Files.list(Paths.get(landing)).count() === 2)

      val table = new KeyedParquetTable(tmpDir("agg"), "tx_minute")
      val q = Pipeline.writer(
        Pipeline.aggregates(SourceAdapters.fixtureDirectory(spark, landing)),
        table, tmpDir("ckpt"), Trigger.AvailableNow).start()
      q.awaitTermination()
      val rows = table.readLatest(spark).collect()
      assert(rows.length === 1) // one minute window
      val r = rows.head
      // dup txs from the second poll deduped by hash: 2 txs, fee sum 300
      assert(r.getAs[Long]("total_nb_trx_1min") === 2L)
      assert(r.getAs[Long]("total_fee_1min") === 300L)
    }
  }

  test("oversize txs are discarded; large polls split into multiple envelopes") {
    val fetched = new Fetcher {
      def fetch(): Option[String] = Some(
        s"""{"txs":[${tx("a" * 900, 1, 0)},${tx("b", 2, 0)},${tx("c", 3, 0)}]}""")
    }
    val landing = tmpDir("landing2")
    // max 800 bytes: the 900-char-hash tx can never fit even alone; b and c
    // pack into one envelope within the prefix overhead
    val poller = new EnvelopePoller(fetched, landing, source = "t", maxEnvelopeBytes = 800)
    val file = poller.pollOnce().get
    assert(poller.droppedTxs === 1L)
    val lines = Files.readAllLines(file)
    assert(lines.size() >= 1)
    lines.forEach { l =>
      assert(l.getBytes(UTF_8).length <= 800)
      assert(l.contains("\"detail-type\":\"Incoming Data\""))
    }
    val all = String.join("\n", lines)
    assert(all.contains("\"hash\":\"b\"") && all.contains("\"hash\":\"c\""))
    assert(!all.contains("a" * 900))
  }

  test("poll loop start/close lands files on the interval") {
    val fetched = new Fetcher {
      def fetch(): Option[String] = Some(s"""{"txs":[${tx("h", 1, 0)}]}""")
    }
    val landing = tmpDir("landing3")
    val poller = new EnvelopePoller(fetched, landing, intervalMs = 50L, source = "loop")
    poller.start()
    try {
      val deadline = System.currentTimeMillis() + 5000
      while (Files.list(Paths.get(landing)).count() < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(Files.list(Paths.get(landing)).count() >= 2)
    } finally poller.close()
  }
}
