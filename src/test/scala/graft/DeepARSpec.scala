package graft

import graft.batch.{DeepAR, NaiveForecaster, TimeSeries}
import graft.monitor.MonitoringJob
import graft.ops.Multimodal

/** DeepAR writer output shapes, monitoring metrics end-to-end (with the
  * deterministic naive forecaster), and the multimodal plumbing. */
class DeepARSpec extends SparkSpec {
  import spark.implicits._

  test("renderSeries emits numbers and NaN strings") {
    val s = DeepAR.renderSeries(TimeSeries("2024-01-01 00:00", Array(1.5, Double.NaN, 3.0)))
    assert(s === """{"start": "2024-01-01 00:00", "target": [1.5, "NaN", 3.0]}""")
  }

  test("writeSplits produces 1/K/1 series files and p-row targets csv") {
    implicit val s = spark
    val df = (1 to 100).map(i => (f"m$i%03d", i.toDouble)).toDF("tx_minute", "v")
    val out = tmpDir("deepar")
    val b = DeepAR.writeSplits(df, "tx_minute", "v", out)
    assert(b.trainLen === 75)
    def lines(p: String) = spark.read.text(s"$out/$p").count()
    assert(lines("train") === 1)
    assert(lines("validation") === 4)
    assert(lines("test_inputs") === 1)
    val tgt = spark.read.option("header", "true").csv(s"$out/test_targets")
    assert(tgt.count() === 5)
    // train series content: first 75 values
    val train = spark.read.text(s"$out/train").as[String].head()
    assert(train.startsWith("""{"start": "m001", "target": [1.0, 2.0"""))
    assert(train.endsWith("75.0]}"))
  }

  test("monitoring job: naive forecaster on a flat series scores zero error") {
    implicit val s = spark
    val df = (1 to 50).map(i => (f"m$i%03d", 7.0)).toDF("tx_minute", "avg_fee_1min")
    val m = MonitoringJob.run(df, "tx_minute", "avg_fee_1min",
      new NaiveForecaster, threshold = 0.24)
    assert(m.rmse === 0.0)
    assert(m.meanWql === 0.0)
    assert(!m.breached)
    assert(m.n === 5)
  }

  test("monitoring job: known errors produce expected wQL and breach flag") {
    implicit val s = spark
    // series: 45 × 10.0 then last 5 are 12 → naive forecast carries 10.0
    val df = ((1 to 45).map(i => (f"m$i%03d", 10.0)) ++
      (46 to 50).map(i => (f"m$i%03d", 12.0))).toDF("tx_minute", "avg_fee_1min")
    val m = MonitoringJob.run(df, "tx_minute", "avg_fee_1min",
      new NaiveForecaster, threshold = 0.1)
    // forecast base = value at position 45 (=10), truth = 12 ×5
    assert(math.abs(m.rmse - 2.0) < 1e-12)
    // pinball(q) per row = q*(12-10) = 2q; weight = 2/60
    // wql_q = (2/60)*5*2q = q/3; mean over {0.05,0.5,0.95} = 0.5/3
    assert(math.abs(m.meanWql - 0.5 / 3.0) < 1e-12)
    assert(m.breached)
  }

  test("multimodal: decode pipeline preserves ids, dims, and determinism") {
    implicit val s = spark
    val payloads = Seq((1L, "abc".getBytes), (2L, "defgh".getBytes), (3L, Array.emptyByteArray))
      .toDF("id", "data")
    val media = Multimodal.asMediaFrame(payloads, "id", "data", "image", "jpeg")
    assert(media.columns.toSeq === Seq("content_id", "payload", "meta"))
    val feats = Multimodal.decodeFeatures(media, new Multimodal.FakeDecoder(16))
    val rows = feats.select("content_id", "n_bytes", "feature_dim")
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows.map { case (k, v) => k -> v._1 } === Map(1L -> 3L, 2L -> 5L, 3L -> 0L))
    assert(rows.values.forall(_._2 === 16))
    // determinism: same payload → same features
    val f1 = feats.filter($"content_id" === 1).select("features").as[Array[Float]].head()
    val f2 = Multimodal.decodeFeatures(media, new Multimodal.FakeDecoder(16))
      .filter($"content_id" === 1).select("features").as[Array[Float]].head()
    assert(f1.toSeq === f2.toSeq)
  }

  test("multimodal: frame sampling emits duration/interval frames") {
    implicit val s = spark
    val media = Seq((1L, Array[Byte](1), 2500L)).toDF("id", "data", "dur")
      .select($"id".as("content_id"), $"data".as("payload"),
        org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.lit("video").as("media_type"),
          org.apache.spark.sql.functions.lit("mp4").as("format"),
          org.apache.spark.sql.functions.lit(null).cast("int").as("width"),
          org.apache.spark.sql.functions.lit(null).cast("int").as("height"),
          $"dur".as("duration_ms"),
          org.apache.spark.sql.functions.lit(null).cast("int").as("sample_rate")).as("meta"))
    val frames = Multimodal.sampleFrames(media, 1000L)
      .select("frame_idx", "frame_ms").as[(Long, Long)].collect().sorted
    assert(frames.toSeq === Seq((0L, 0L), (1L, 1000L)))
  }
}
