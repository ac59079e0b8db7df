package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.{Duration, Instant}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import com.fasterxml.jackson.databind.ObjectMapper

/** S1, production form — the reference's ingestion worker polls the
  * unconfirmed-transaction feed on a fixed interval, wraps the txs in
  * size-bounded EventBridge envelopes, and forwards them to the bus
  * (ref: resources/services/ingestion-worker/lib.js:36-50 poll loop,
  * :95-176 batching/forwarding).
  *
  * Spark-native shape: the poller is a tiny producer-side daemon that lands
  * one JSON-lines file per poll (one line = one envelope) into a landing
  * directory; the engine consumes the directory as a file stream
  * ([[SourceAdapters.fixtureDirectory]]) — the standard landing-zone pattern,
  * which keeps the unreliable network edge OUTSIDE the streaming query and
  * its checkpoint/replay semantics.
  *
  * The HTTP edge is behind [[Fetcher]], so the pipeline integration-tests
  * against a local stub server with zero egress.
  */
trait Fetcher {
  /** One poll: the feed body (expected `{"txs": [...]}`), or None on error. */
  def fetch(): Option[String]
}

/** java.net.http fetcher (JDK built-in — no extra dependency). */
class HttpFetcher(url: String, timeoutMs: Long = 10000L) extends Fetcher {
  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs)).build()
  override def fetch(): Option[String] =
    try {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMs)).GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() == 200) Some(resp.body()) else None
    } catch { case _: Exception => None }
}

/** Polls `fetcher` every `intervalMs`, splits each poll's txs into ≤
  * `maxEnvelopeBytes` envelopes ([[EnvelopeBatcher]] — single oversize txs
  * are discarded, lib.js:136-143), and atomically publishes one landing file
  * per poll. */
class EnvelopePoller(fetcher: Fetcher, landingDir: String,
                     intervalMs: Long = 15000L, source: String = "graft-poller",
                     maxEnvelopeBytes: Int = EnvelopeBatcher.DefaultMaxBytes,
                     clock: () => Instant = () => Instant.now()) extends AutoCloseable {

  private val mapper = new ObjectMapper
  private val running = new AtomicBoolean(false)
  private var thread: Thread = _
  // atomic: pollOnce() is public and may race the daemon loop — two polls
  // must never mint the same sequence number (colliding .tmp/landing names)
  private val seq = new AtomicLong(0L)
  private val dropped = new AtomicLong(0L)

  /** Total oversize txs discarded (the reference's dropped-tx metric). */
  def droppedTxs: Long = dropped.get()

  private def envelopePrefix(id: String): String =
    s"""{"version":0,"id":"$id","detail-type":"Incoming Data","source":"$source",""" +
      s""""account":0,"time":"${clock()}","region":"","resources":[],"detail":{"txs":["""
  private val envelopeSuffix = "]}}"

  /** One poll → one landing file (JSON lines, one envelope per line), or
    * None when the fetch failed or yielded no packable txs. Files are
    * written to a dot-temp name then renamed: the file stream must never
    * observe a partially written file. */
  def pollOnce(): Option[Path] = fetcher.fetch().flatMap { body =>
    val txs =
      try {
        val root = mapper.readTree(body).path("txs")
        if (!root.isArray) Seq.empty
        else (0 until root.size()).map(i => mapper.writeValueAsString(root.get(i)))
      } catch { case _: Exception => Seq.empty[String] }
    // claim this poll's sequence number atomically, then size against a
    // representative fixed-width id and stamp each batch with its own
    // unique id (the reference gives every bus entry one)
    val n = seq.getAndIncrement()
    val sizingPrefix = envelopePrefix(f"$source-$n-0000")
    val (batches, oversize) =
      EnvelopeBatcher.split(sizingPrefix, envelopeSuffix, txs, maxEnvelopeBytes)
    dropped.addAndGet(oversize.length.toLong)
    if (batches.isEmpty) None
    else {
      val dir = Paths.get(landingDir)
      Files.createDirectories(dir)
      val lines = batches.zipWithIndex.map { case (b, i) =>
        envelopePrefix(f"$source-$n-$i%04d") + b.mkString(",") + envelopeSuffix
      }.mkString("\n")
      val tmp = dir.resolve(s".poll-$n.tmp")
      val dst = dir.resolve(f"poll-$n%09d.json")
      Files.write(tmp, lines.getBytes(UTF_8))
      Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
      Some(dst)
    }
  }

  /** Start the poll loop on a daemon thread. */
  def start(): Unit = if (running.compareAndSet(false, true)) {
    thread = new Thread(() => {
      while (running.get()) {
        // a poll must never kill the loop: transient I/O failures (disk
        // full, landing dir unwritable) are skipped like failed fetches
        try pollOnce()
        catch { case scala.util.control.NonFatal(_) | (_: InterruptedException) => }
        try Thread.sleep(intervalMs)
        catch { case _: InterruptedException => /* stopping */ }
      }
    }, s"envelope-poller-$source")
    thread.setDaemon(true)
    thread.start()
  }

  override def close(): Unit = if (running.compareAndSet(true, false)) {
    thread.interrupt()
    thread.join(5000)
  }
}
