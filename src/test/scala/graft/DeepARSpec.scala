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

  test("fleet monitoring: per-key metrics match the single-series job") {
    implicit val s = spark
    // three series: flat (zero error), shifted tail (known rmse/wql,
    // breaches), and one too short to score (must surface, not vanish)
    val flat = (1 to 50).map(i => ("flat", f"m$i%03d", 10.0))
    val shift = (1 to 45).map(i => ("shift", f"m$i%03d", 10.0)) ++
      (46 to 50).map(i => ("shift", f"m$i%03d", 12.0))
    val short = (1 to 3).map(i => ("short", f"m$i%03d", 5.0))
    val df = (flat ++ shift ++ short).toDF("series", "tx_minute", "avg_fee_1min")

    val fleet = MonitoringJob.runFleet(df, "series", "tx_minute", "avg_fee_1min",
      new NaiveForecaster, threshold = 0.1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(fleet.keySet === Set("flat", "shift", "short"))

    val f = fleet("flat")
    assert(f.getDouble(1) === 0.0 && f.getDouble(2) === 0.0 && !f.getBoolean(5))

    // shift must agree exactly with the single-series job on the same data
    val single = MonitoringJob.run(
      df.filter($"series" === "shift").drop("series"),
      "tx_minute", "avg_fee_1min", new NaiveForecaster, threshold = 0.1)
    val sh = fleet("shift")
    assert(math.abs(sh.getDouble(1) - single.rmse) < 1e-12)
    assert(math.abs(sh.getDouble(2) - single.meanWql) < 1e-12)
    assert(sh.getBoolean(5) === single.breached)

    val st = fleet("short")
    assert(st.getLong(3) === 0L && st.getDouble(1).isNaN && !st.getBoolean(5))

    // bounded state: a tight maxHistory cap still scores (naive forecaster
    // reads only the window tail, which the ring buffer preserves)
    val capped = MonitoringJob.runFleet(df, "series", "tx_minute", "avg_fee_1min",
      new NaiveForecaster, threshold = 0.1, maxHistory = 7L)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(capped("shift") - single.rmse) < 1e-12)
  }

  test("fleet monitoring orders numeric keys numerically, not lexically") {
    implicit val s = spark
    // order keys 1..50 as LONGS: lexicographic order would interleave
    // (1, 10, 11, ..., 2, 20, ...) and pick a wrong forecast window
    val df = ((1 to 45).map(i => ("k", i.toLong, 10.0)) ++
      (46 to 50).map(i => ("k", i.toLong, 12.0))).toDF("series", "pos", "v")
    val m = MonitoringJob.runFleet(df, "series", "pos", "v",
      new NaiveForecaster, threshold = 0.1).collect().head
    // truth = last 5 (12.0), base = position 45 (10.0) → rmse exactly 2
    assert(math.abs(m.getDouble(1) - 2.0) < 1e-12)
  }

  test("multimodal: WAV sample-level decode is encodeWavPcm16's exact inverse") {
    val samples = Array(0, 16384, -16384, 8192, 0, 0, -1, 32767, -32768, 1)
    val decoded = Multimodal.decodeWavPcm16Mono(Multimodal.encodeWavPcm16(samples))
    assert(decoded.toSeq === samples.toSeq, "order and values preserved exactly")
    // clamping applies on encode, not decode
    assert(Multimodal.decodeWavPcm16Mono(
      Multimodal.encodeWavPcm16(Array(40000, -40000))).toSeq === Seq(32767, -32768))
    assert(Multimodal.decodeWavPcm16Mono(
      Multimodal.encodeWavPcm16(Array.empty[Int])).isEmpty)
    intercept[IllegalArgumentException] {
      Multimodal.decodeWavPcm16Mono("notawavnotawavnotawavnotawavnotawavnotawavnotawav".getBytes)
    }
  }

  test("multimodal: PGM round trip, header grammar, padding, truncation") {
    val gray = Array(0, 17, 200, 255, 128, 1, 254, 99, 42)
    val (w, h, px) = Multimodal.decodePgm(Multimodal.encodePgm(gray, 4))
    assert((w, h) === ((4, 3)), "9 px at width 4 → 3 rows")
    assert(px.take(9).toSeq === gray.toSeq, "values exact")
    assert(px.drop(9).forall(_ == 0), "last row zero-padded")
    // clamping on encode
    assert(Multimodal.decodePgm(Multimodal.encodePgm(Array(300, -5), 2))
      ._3.toSeq === Seq(255, 0))
    // header grammar the encoder never emits but the spec allows:
    // comments and arbitrary whitespace runs between tokens
    val exotic = "P5 # comment\n#another\n 3\t1 # w h\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30)
    assert(Multimodal.decodePgm(exotic)._3.toSeq === Seq(10, 20, 30))
    intercept[IllegalArgumentException] { Multimodal.decodePgm("P6\n1 1\n255\nx".getBytes) }
    intercept[IllegalArgumentException] { // truncated raster
      Multimodal.decodePgm("P5\n4 4\n255\nab".getBytes)
    }
    intercept[IllegalArgumentException] { // 16-bit maxval unsupported
      Multimodal.decodePgm("P5\n1 1\n65535\nxx".getBytes)
    }
  }

  test("multimodal: energy-gate segmentation counts runs, order-sensitively") {
    import Multimodal.segmentVoiced
    //                          |--v--|  s |v| s  |---v---|
    val s1 = Array(8000, 9000, 0, 5000, 0, 0, 6000, 7000, 8000)
    assert(segmentVoiced(s1, 4096) === ((3L, 6L, 3L)))
    assert(segmentVoiced(Array.empty[Int], 4096) === ((0L, 0L, 0L)))
    assert(segmentVoiced(Array(0, 0, 0), 4096) === ((0L, 0L, 0L)), "all silence")
    assert(segmentVoiced(Array(5000, 5000), 4096) === ((1L, 2L, 2L)), "all voiced")
    assert(segmentVoiced(Array(-5000), 4096) === ((1L, 1L, 1L)), "negative amplitude is energy")
    assert(segmentVoiced(Array(4096), 4096) === ((0L, 0L, 0L)), "threshold is strict")
    // permuting samples changes the segmentation — the order-sensitivity m9 pins
    val s2 = Array(5000, 0, 5000, 0, 5000, 0)
    assert(segmentVoiced(s2, 4096)._1 === 3L)
    assert(segmentVoiced(s2.sorted, 4096)._1 === 1L)
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

  test("multimodal: BuiltinDecoder decodes a real 24-bit BMP payload") {
    implicit val s = spark
    // 3×2 bottom-up BMP, 24bpp: rowBytes = 3*3 padded to 12.
    // Visual layout (top row first): [red, green, blue] / [white, black, gray(64)]
    def px(b: Int, g: Int, r: Int) = Array(b.toByte, g.toByte, r.toByte)
    val topRow = px(0, 0, 255) ++ px(0, 255, 0) ++ px(255, 0, 0) ++ Array[Byte](0, 0, 0)
    val botRow = px(255, 255, 255) ++ px(0, 0, 0) ++ px(64, 64, 64) ++ Array[Byte](0, 0, 0)
    val pixelData = botRow ++ topRow // bottom-up storage
    val bb = java.nio.ByteBuffer.allocate(54 + pixelData.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + pixelData.length)
      .putInt(0).putInt(54)             // reserved, data offset
      .putInt(40).putInt(3).putInt(2)   // BITMAPINFOHEADER, w=3, h=2 (bottom-up)
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(pixelData.length).putInt(2835).putInt(2835).putInt(0).putInt(0)
    bb.put(pixelData)
    val bmp = bb.array()

    val media = Multimodal.asMediaFrame(
      Seq((7L, bmp)).toDF("id", "data"), "id", "data", "image", "bmp")
    val f = Multimodal.decodeFeatures(media, new Multimodal.BuiltinDecoder)
      .select("feature_dim", "features").as[(Int, Array[Float])].head()
    assert(f._1 === 12)
    val Array(w, h, mb, mg, mr, q0, q1, q2, q3, nzB, nzG, nzR) = f._2
    assert(w === 3f && h === 2f)
    // channel means over all 6 px: B=(0+0+255+255+0+64)/6, G=(0+255+0+255+0+64)/6, R=(255+0+0+255+0+64)/6
    assert(math.abs(mb - 574f / 6) < 1e-3 && math.abs(mg - 574f / 6) < 1e-3 &&
      math.abs(mr - 574f / 6) < 1e-3)
    // quadrants (y<1 = top): q0 = top-left (x<2: red, green) gray = (85+85)/2
    assert(math.abs(q0 - 85f) < 1e-3)
    // q1 = top-right (blue) gray 85; q2 = bottom-left (white, black) = (255+0)/2
    assert(math.abs(q1 - 85f) < 1e-3 && math.abs(q2 - 127.5f) < 1e-3)
    // q3 = bottom-right (gray 64)
    assert(math.abs(q3 - 64f) < 1e-3)
    // exact bright-pixel (> 127) counts: each channel is 255 in exactly its
    // own primary pixel + white; gray(64) is never bright
    assert(nzB === 2f && nzG === 2f && nzR === 2f)
  }

  test("multimodal: encodeBmp24 round-trips through BuiltinDecoder with row padding") {
    implicit val s = spark
    // 5 px at width 2 → height 3, one black pad pixel; width 2 also forces
    // 4-byte row padding (rowBytes 6 → 8)
    val pixels = Array(0x0000ff, 0x00ff00, 0xff0000, 0xffffff, 0x404040)
    val bmp = Multimodal.encodeBmp24(pixels, width = 2)
    val media = Multimodal.asMediaFrame(
      Seq((11L, bmp)).toDF("id", "data"), "id", "data", "image", "bmp")
    val f = Multimodal.decodeFeatures(media, new Multimodal.BuiltinDecoder)
      .select("feature_dim", "features").as[(Int, Array[Float])].head()
    assert(f._1 === 12)
    val Array(w, h, mb, mg, mr, _, _, _, _, nzB, nzG, nzR) = f._2
    assert(w === 2f && h === 3f)
    // channel sums over 6 px (pad contributes 0): B = 255+0+0+255+64 = 574,
    // G = 0+255+0+255+64 = 574, R = 0+0+255+255+64 = 574
    Seq(mb, mg, mr).foreach(m => assert(math.abs(m - 574f / 6) < 1e-3))
    // bright counts: primary + white per channel; pad and gray(64) excluded
    assert(nzB === 2f && nzG === 2f && nzR === 2f)
  }

  test("multimodal: resizeBmpNearest samples the integer grid, handles odd dims") {
    implicit val s = spark
    // 4x4 image, distinct pixel per cell: value = (row*4+col) in the blue
    // channel scaled so sampled cells are recognizable
    val px4 = Array.tabulate(16)(i => i * 0x10)
    val bmp4 = Multimodal.resizeBmpNearest(Multimodal.encodeBmp24(px4, 4), 2)
    val media = Multimodal.asMediaFrame(
      Seq((1L, bmp4)).toDF("id", "data"), "id", "data", "image", "bmp")
    val f = Multimodal.decodeFeatures(media, new Multimodal.BuiltinDecoder)
      .select("features").as[Array[Float]].head()
    assert(f(0) === 2f && f(1) === 2f, "4x4 / 2 = 2x2")
    // sampled cells (0,0),(0,2),(2,0),(2,2) → blue values 0x00,0x20,0x80,0xA0
    // mean blue = (0 + 32 + 128 + 160) / 4 = 80
    assert(math.abs(f(2) - 80f) < 1e-3)
    // odd dims: 5 px wide, 3 rows (ceil(15/5)) → out 3x2
    val px15 = Array.fill(15)(0xffffff)
    val bmpOdd = Multimodal.resizeBmpNearest(Multimodal.encodeBmp24(px15, 5), 2)
    val mOdd = Multimodal.asMediaFrame(
      Seq((2L, bmpOdd)).toDF("id", "data"), "id", "data", "image", "bmp")
    val fo = Multimodal.decodeFeatures(mOdd, new Multimodal.BuiltinDecoder)
      .select("features").as[Array[Float]].head()
    assert(fo(0) === 3f && fo(1) === 2f, "ceil(5/2) x ceil(3/2)")
    assert(fo(9) === 6f && fo(10) === 6f && fo(11) === 6f,
      "all-white input stays all-bright after sampling")
    // factor 1 is the identity on pixels (re-encode changes no value)
    val id1 = Multimodal.resizeBmpNearest(Multimodal.encodeBmp24(px4, 4), 1)
    assert(java.util.Arrays.equals(id1, Multimodal.encodeBmp24(px4, 4)))
  }

  test("multimodal: encodePng round-trips through BuiltinDecoder, all five filters") {
    implicit val s = spark
    // 17 px at width 3 → height 6: rows exercise filters 0,1,2,3,4,0 and the
    // last row carries one black pad pixel. Deterministic varied pixels so
    // Sub/Up/Average/Paeth reconstruction is non-trivial.
    val pixels = Array.tabulate(17)(i => ((i * 37 + 11) % 256 << 16) |
      ((i * 101 + 7) % 256 << 8) | ((i * 53 + 3) % 256))
    val png = Multimodal.encodePng(pixels, width = 3)
    // container-independence: the SAME pixels as a BMP must yield the SAME
    // features bit-for-bit (shared layout [w, h, meanB, meanG, meanR, quads])
    val bmp = Multimodal.encodeBmp24(pixels, width = 3)
    val media = Multimodal.asMediaFrame(
      Seq((21L, png)).toDF("id", "data"), "id", "data", "image", "png")
      .union(Multimodal.asMediaFrame(
        Seq((22L, bmp)).toDF("id", "data"), "id", "data", "image", "bmp"))
    val f = Multimodal.decodeFeatures(media, new Multimodal.BuiltinDecoder)
      .select("content_id", "feature_dim", "features")
      .as[(Long, Int, Array[Float])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(f(21L)._1 === 12 && f(22L)._1 === 12)
    assert(f(21L)._2.toSeq === f(22L)._2.toSeq)
    assert(f(21L)._2(0) === 3f && f(21L)._2(1) === 6f)
  }

  test("multimodal: Adam7-interlaced PNG decodes identically to non-interlaced") {
    implicit val s = spark
    // dims chosen so passes are non-trivial: 13x11 covers all 7 passes with
    // different sub-image sizes AND partial pass rows; 3x2 leaves passes
    // 1-only/sparse (passes 2,4 empty at width 3? no — pass 2 starts at
    // x=4 > 2, so it IS empty: the empty-pass path is exercised); 1x1 is
    // the degenerate single-pixel image (only pass 1 non-empty)
    for ((w, n) <- Seq((13, 13 * 11), (3, 6), (1, 1), (8, 8 * 8), (17, 17 * 5))) {
      val pixels = Array.tabulate(n)(i => ((i * 37 + 11) % 256 << 16) |
        ((i * 101 + 7) % 256 << 8) | ((i * 53 + 3) % 256))
      val plain = Multimodal.encodePng(pixels, w)
      val adam7 = Multimodal.encodePngAdam7(pixels, w)
      val media = Multimodal.asMediaFrame(
        Seq((31L, plain)).toDF("id", "data"), "id", "data", "image", "png")
        .union(Multimodal.asMediaFrame(
          Seq((32L, adam7)).toDF("id", "data"), "id", "data", "image", "png"))
      val f = Multimodal.decodeFeatures(media, new Multimodal.BuiltinDecoder)
        .select("content_id", "feature_dim", "features")
        .as[(Long, Int, Array[Float])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(f(32L)._1 === 12, s"interlaced decode failed at ${w}x${n / w}")
      assert(f(32L)._2.toSeq === f(31L)._2.toSeq,
        s"interlaced features diverge from non-interlaced at width $w")
    }
  }

  test("multimodal: uniform-block JPEG round-trips EXACTLY through BuiltinDecoder") {
    implicit val s = spark
    // 7 values at width 5 blocks → 40×16 px, 3 black pad blocks; uniform
    // blocks are stored lossless by the all-ones-quant baseline codec
    val vals = Array(255, 0, 200, 17, 255, 128, 64)
    val jpg = graft.ops.Jpeg.encodeGrayBlocks(vals, widthBlocks = 5)
    // decode side first: exact pixel recovery
    val (w, h, gray) = graft.ops.Jpeg.decodeGray(jpg)
    assert(w === 40 && h === 16)
    for (i <- vals.indices; y <- 0 until 8; x <- 0 until 8)
      assert(gray((i / 5 * 8 + y) * w + i % 5 * 8 + x) === vals(i),
        s"block $i pixel ($x,$y) not exact")
    // feature side: 12-dim image layout, exact bright counts — four vals
    // exceed 127 (255, 200, 255, 128; the boundary 128 IS bright)
    val media = Multimodal.asMediaFrame(
      Seq((41L, jpg)).toDF("id", "data"), "id", "data", "image", "jpeg")
    val f = Multimodal.decodeFeatures(media, new Multimodal.BuiltinDecoder)
      .select("feature_dim", "features").as[(Int, Array[Float])].head()
    assert(f._1 === 12)
    assert(f._2(0) === 40f && f._2(1) === 16f)
    assert(f._2(9) === 4 * 64f && f._2(10) === 4 * 64f && f._2(11) === 4 * 64f)
    // mean over all 640 px: (255+0+200+17+255+128+64)·64 / 640
    assert(math.abs(f._2(2) - (vals.sum * 64f / 640)) < 1e-3)
  }

  test("multimodal: arbitrary-pixel JPEG round-trips within quantization error") {
    // non-uniform blocks exercise the full AC path (ZRL, EOB, many
    // run/size symbols) and the DC-diff chain across 12 blocks; quality-100
    // baseline is lossy only through per-coefficient rounding (≤ 0.5 each)
    val w = 24; val h = 32
    val gray = Array.tabulate(w * h)(i => (i * 37 + (i * i) % 91 + i / w * 13) % 256)
    val jpg = graft.ops.Jpeg.encodeGray(gray, w)
    val (dw, dh, out) = graft.ops.Jpeg.decodeGray(jpg)
    assert(dw === w && dh === h)
    val maxErr = gray.indices.map(i => math.abs(gray(i) - out(i))).max
    assert(maxErr <= 3, s"max pixel error $maxErr exceeds quantization bound")
  }

  test("multimodal: color JPEG (YCbCr 4:4:4) round-trips within transform error") {
    implicit val s = spark
    // varied colors over 4 MCUs: error budget = per-coefficient rounding
    // (<=0.5 each in the YCbCr domain) amplified by the JFIF color transform
    val w = 16; val h = 16
    val rgb = Array.tabulate(w * h)(i =>
      (((i * 37) % 256) << 16) | (((i * 91 + 17) % 256) << 8) | ((i * 53 + 101) % 256))
    val jpg = graft.ops.Jpeg.encodeColor(rgb, w)
    val (dw, dh, out) = graft.ops.Jpeg.decodeRgb(jpg)
    assert(dw === w && dh === h)
    def chans(p: Int) = Seq((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    val maxErr = (0 until w * h)
      .flatMap(i => chans(rgb(i)).zip(chans(out(i))).map(t => math.abs(t._1 - t._2))).max
    assert(maxErr <= 5, s"max channel error $maxErr exceeds transform budget")

    // uniform-color image: DC-only planes, error only from the color
    // transform round-trip itself (<=1 per channel)
    val solid = Array.fill(64)(0xc83214)
    val (_, _, outS) = graft.ops.Jpeg.decodeRgb(graft.ops.Jpeg.encodeColor(solid, 8))
    val errS = outS.flatMap(p => chans(p).zip(chans(0xc83214)).map(t => math.abs(t._1 - t._2))).max
    assert(errS <= 1, s"solid-color error $errS")

    // color payloads flow through BuiltinDecoder's shared 12-dim layout
    val media = Multimodal.asMediaFrame(
      Seq((61L, jpg)).toDF("id", "data"), "id", "data", "image", "jpg")
    val f = Multimodal.decodeFeatures(media, new Multimodal.BuiltinDecoder)
      .select("feature_dim", "features").as[(Int, Array[Float])].head()
    assert(f._1 === 12)
    assert(f._2(0) === 16f && f._2(1) === 16f)
    // bright counts match a direct count over the DECODED pixels exactly
    val nzExpected = Seq(16, 8, 0).map(sh => out.count(p => ((p >> sh) & 0xff) > 127))
    assert(Seq(f._2(11), f._2(10), f._2(9)).map(_.toInt) === nzExpected)
  }

  test("multimodal: color JPEG 4:2:0 — cell-uniform within budget, MCU-uniform b/w exact") {
    implicit val s = spark
    // image uniform per 2x2 cell: the box average loses nothing, so the
    // round trip stays within the same transform budget as 4:4:4
    val w = 16; val h = 16
    val rgb = Array.tabulate(w * h) { i =>
      val cell = (i / w / 2) * 8 + (i % w / 2)
      (((cell * 37) % 256) << 16) | (((cell * 91 + 17) % 256) << 8) | ((cell * 53 + 101) % 256)
    }
    val jpg = graft.ops.Jpeg.encodeColor420(rgb, w)
    val (dw, dh, out) = graft.ops.Jpeg.decodeRgb(jpg)
    assert(dw === w && dh === h)
    def chans(p: Int) = Seq((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    val maxErr = (0 until w * h)
      .flatMap(i => chans(rgb(i)).zip(chans(out(i))).map(t => math.abs(t._1 - t._2))).max
    assert(maxErr <= 5, s"max channel error $maxErr exceeds transform budget")

    // black/white MCUs have integer YCbCr (Y 0/255, Cb=Cr=128), uniform
    // blocks in BOTH tiers after the box average — bit-exact round trip
    val w2 = 32; val h2 = 16
    val bw2 = Array.tabulate(w2 * h2)(i =>
      if ((i % w2) / 16 == 0) 0xffffff else 0x000000)
    val (_, _, outBw) = graft.ops.Jpeg.decodeRgb(graft.ops.Jpeg.encodeColor420(bw2, w2))
    assert(outBw.toSeq === bw2.toSeq, "MCU-uniform black/white must be bit-exact in 4:2:0")

    // non-MCU-aligned dims: edge cells average only covered pixels; the
    // replication upsample restores them — cell-uniform content stays exact
    val w3 = 18; val h3 = 10
    val oddRgb = Array.tabulate(w3 * h3)(i =>
      if (((i / w3 / 2) + (i % w3 / 2)) % 2 == 0) 0xffffff else 0x000000)
    val (dw3, dh3, out3) = graft.ops.Jpeg.decodeRgb(graft.ops.Jpeg.encodeColor420(oddRgb, w3))
    assert(dw3 === w3 && dh3 === h3)
    assert(out3.toSeq === oddRgb.toSeq, "cell-uniform b/w at odd dims must be exact")
  }

  test("multimodal: 4:2:0 primary-color MCUs give exact channel counts (m4b contract)") {
    implicit val s = spark
    // palette per 16x16 MCU: white, red, blue, black — the m4b oracle reads
    // n_white/n_red/n_blue off the decoder's nz channel counts, which must
    // be EXACT because primary colors decode with >100 margin to the 127
    // threshold (white/black are bit-exact; red/blue within +-3)
    val mcusX = 2; val mcusY = 2
    val w = mcusX * 16; val h = mcusY * 16
    val palette = Array(0xffffff, 0xff0000, 0x0000ff, 0x000000)
    val rgb = Array.tabulate(w * h) { i =>
      val m = (i / w / 16) * mcusX + (i % w / 16)
      palette(m % 4)
    }
    val jpg = graft.ops.Jpeg.encodeColor420(rgb, w)
    val media = Multimodal.asMediaFrame(
      Seq((71L, jpg)).toDF("id", "data"), "id", "data", "image", "jpeg")
    val f = Multimodal.decodeFeatures(media, new Multimodal.BuiltinDecoder)
      .select("feature_dim", "features").as[(Int, Array[Float])].head()
    assert(f._1 === 12)
    assert(f._2(0) === w.toFloat && f._2(1) === h.toFloat)
    // one MCU of each color: nzR = white+red, nzG = white, nzB = white+blue
    assert(f._2(11) === 512f, s"nzR ${f._2(11)}")
    assert(f._2(10) === 256f, s"nzG ${f._2(10)}")
    assert(f._2(9) === 512f, s"nzB ${f._2(9)}")
  }

  test("multimodal: corrupted JPEG payloads yield empty features") {
    implicit val s = spark
    val jpg = graft.ops.Jpeg.encodeGrayBlocks(Array(255, 0, 128), widthBlocks = 2)
    val truncated = jpg.take(jpg.length / 2)
    val noSoi = jpg.clone(); noSoi(1) = 0x00
    val media = Multimodal.asMediaFrame(
      Seq((51L, truncated), (52L, noSoi)).toDF("id", "data"),
      "id", "data", "image", "jpeg")
    val dims = Multimodal.decodeFeatures(media, new Multimodal.BuiltinDecoder)
      .select("feature_dim").as[Int].collect()
    assert(dims.toSeq === Seq(0, 0))
  }

  test("multimodal: corrupted PNG (bad CRC / truncated IDAT) yields empty features") {
    implicit val s = spark
    val png = Multimodal.encodePng(Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff), width = 2)
    val badCrc = png.clone(); badCrc(badCrc.length - 5) = (badCrc(badCrc.length - 5) ^ 0x7f).toByte
    val truncated = png.take(png.length - 20)
    val media = Multimodal.asMediaFrame(
      Seq((31L, badCrc), (32L, truncated)).toDF("id", "data"), "id", "data", "image", "png")
    val dims = Multimodal.decodeFeatures(media, new Multimodal.BuiltinDecoder)
      .select("feature_dim").as[Int].collect()
    assert(dims.toSeq === Seq(0, 0))
  }

  test("multimodal: BuiltinDecoder decodes a real 16-bit PCM WAV payload") {
    implicit val s = spark
    // mono 8kHz square wave: 100 frames of +16384, 100 of -16384 → |s|=0.5
    // everywhere: rms = 0.5, peak = 0.5, one sign change → zcr = 1/200
    val n = 200
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952).putInt(36 + 2 * n).putInt(0x45564157) // RIFF size WAVE
    bb.putInt(0x20746d66).putInt(16)  // "fmt ", 16
      .putShort(1).putShort(1)        // PCM, mono
      .putInt(8000).putInt(16000)     // rate, byte rate
      .putShort(2).putShort(16)       // block align, bits
    bb.putInt(0x61746164).putInt(2 * n) // "data"
    (0 until n).foreach(i => bb.putShort(if (i < n / 2) 16384 else -16384))
    val wav = bb.array()

    val media = Multimodal.asMediaFrame(
      Seq((8L, wav)).toDF("id", "data"), "id", "data", "audio", "wav")
    val f = Multimodal.decodeFeatures(media, new Multimodal.BuiltinDecoder)
      .select("feature_dim", "features").as[(Int, Array[Float])].head()
    assert(f._1 === 9)
    val Array(rate, frames, rms, zcr, peak, r0, r1, r2, r3) = f._2
    assert(rate === 8000f && frames === 200f)
    assert(math.abs(rms - 0.5f) < 1e-4 && math.abs(peak - 0.5f) < 1e-4)
    assert(math.abs(zcr - 1f / 200) < 1e-6)
    Seq(r0, r1, r2, r3).foreach(r => assert(math.abs(r - 0.5f) < 1e-4))
  }

  test("multimodal: BuiltinDecoder yields empty features for malformed payloads") {
    implicit val s = spark
    val junk = Seq((9L, "not-a-bmp-at-all".getBytes)).toDF("id", "data")
    val f = Multimodal.decodeFeatures(
      Multimodal.asMediaFrame(junk, "id", "data", "image", "bmp"),
      new Multimodal.BuiltinDecoder)
      .select("feature_dim").as[Int].head()
    assert(f === 0)

    // negative chunk length: the walk must FAIL (→ empty features), not
    // stall — off += 8 + len + (len & 1) stops advancing at len = -8
    val bb = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952).putInt(56).putInt(0x45564157)
    bb.putInt(0x20746d66).putInt(-8) // poisoned length
    val evil = Multimodal.decodeFeatures(
      Multimodal.asMediaFrame(Seq((10L, bb.array())).toDF("id", "data"),
        "id", "data", "audio", "wav"),
      new Multimodal.BuiltinDecoder)
      .select("feature_dim").as[Int].head()
    assert(evil === 0)
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

  test("avi: container round-trips frame payloads byte-losslessly") {
    // container-level contract only: payloads are opaque (odd lengths
    // exercise the RIFF even-padding rule)
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](9), Array.fill(10)(7.toByte))
    val avi = graft.ops.Avi.encodeMjpeg(frames, 48, 16, fps = 25)
    val v = graft.ops.Avi.decodeMjpeg(avi)
    assert(v.width === 48 && v.height === 16)
    assert(math.abs(v.fps - 25.0) < 1e-9)
    assert(v.frames.length === 3)
    v.frames.zip(frames).foreach { case (got, want) => assert(got.toSeq === want.toSeq) }
  }

  test("multimodal: MJPEG AVI features sample every 2nd frame exactly") {
    implicit val s = spark
    // four uniform-block frames; stride 2 samples frames 0 and 2
    //   f0: [255, 0]      → 2 blocks, 1 row, 128 px, 64 bright
    //   f1: [255]×7       → would add 448 bright px — MUST be skipped
    //   f2: [0, 255, 255] → 3 blocks, 1 row, 192 px, 128 bright
    //   f3: [255]         → skipped
    val mk = (vals: Array[Int]) => graft.ops.Jpeg.encodeGrayBlocks(vals, widthBlocks = 6)
    val avi = graft.ops.Avi.encodeMjpeg(
      Seq(mk(Array(255, 0)), mk(Array.fill(7)(255)), mk(Array(0, 255, 255)), mk(Array(255))),
      48, 8, fps = 10)
    val media = Multimodal.asMediaFrame(
      Seq((7L, avi)).toDF("id", "data"), "id", "data", "video", "avi")
    val f = Multimodal.decodeFeatures(media, new Multimodal.BuiltinDecoder)
      .select("feature_dim", "features").as[(Int, Array[Float])].head()
    assert(f._1 === 9)
    assert(f._2(0) === 48f && f._2(1) === 8f)                 // nominal dims
    assert(f._2(2) === 4f && f._2(3) === 2f)                  // frames, sampled
    // f0 is 2 blocks padded to 6-wide ⇒ 384 px; f2 likewise ⇒ 384
    assert(f._2(4) === 768f)
    assert(f._2(5) === (1 + 2) * 64f)                         // bright blocks of f0+f2
    assert(f._2(7) === 10f && f._2(8) === 2f)                 // fps, stride
  }

  test("avi: malformed containers are rejected (and yield empty features)") {
    implicit val s = spark
    val good = graft.ops.Avi.encodeMjpeg(
      Seq(graft.ops.Jpeg.encodeGrayBlocks(Array(255), 1)), 8, 8)
    // header claims one more frame than movi carries
    val badCount = good.clone()
    badCount(48) = 2 // avih dwTotalFrames (RIFF 12 + LIST 12 + avih 8 + 16)
    // truncation, wrong magic, frame-count lie: all must reject
    val bads = Seq(good.take(10), "RIFX".getBytes ++ good.drop(4), badCount)
    bads.foreach { b =>
      intercept[IllegalArgumentException](graft.ops.Avi.decodeMjpeg(b))
    }
    val media = Multimodal.asMediaFrame(
      bads.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("id", "data"),
      "id", "data", "video", "avi")
    val dims = Multimodal.decodeFeatures(media, new Multimodal.BuiltinDecoder)
      .select("feature_dim").as[Int].collect()
    assert(dims.toSeq === Seq(0, 0, 0))
  }

  test("avi: fuzz corpus — malformed rejects cleanly, odd-but-legal tolerated") {
    // Hand-assembled RIFF variants: every malformed container must raise
    // IllegalArgumentException (never crash, hang, or mis-decode), while
    // structurally odd but legal containers (unknown LISTs, zero-size JUNK,
    // missing idx1) must decode. The hdrl section is reused verbatim from a
    // known-good 2-frame encode so only the spliced region varies.
    import java.nio.{ByteBuffer, ByteOrder}
    def le(i: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array
    def cc(s: String): Array[Byte] = s.getBytes("ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      cc(id) ++ le(body.length) ++ body ++
        (if ((body.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      cc("LIST") ++ le(body.length + 4) ++ cc(typ) ++ body
    def riff(body: Array[Byte]): Array[Byte] =
      cc("RIFF") ++ le(body.length + 4) ++ cc("AVI ") ++ body

    val frame = graft.ops.Jpeg.encodeGrayBlocks(Array(255), 1)
    val good = graft.ops.Avi.encodeMjpeg(Seq(frame, frame), 8, 8)
    val hdrlSize = ByteBuffer.wrap(good, 16, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    val hdrl = good.slice(12, 12 + 8 + hdrlSize) // LIST..hdrl section, self-contained
    val movi2 = list("movi", chunk("00dc", frame) ++ chunk("00dc", frame))

    // -- legal-but-odd: all must decode to exactly the two frames --
    val tolerated = Seq(
      "no idx1" -> riff(hdrl ++ movi2),
      "unknown INFO list + JUNK" -> riff(hdrl ++
        list("INFO", chunk("ISFT", cc("graft"))) ++ movi2 ++ chunk("JUNK", Array.emptyByteArray)),
      "zero-size JUNK inside movi" -> riff(hdrl ++ list("movi",
        chunk("00dc", frame) ++ chunk("JUNK", Array.emptyByteArray) ++ chunk("00dc", frame))))
    tolerated.foreach { case (name, bytes) =>
      val v = graft.ops.Avi.decodeMjpeg(bytes)
      assert(v.frames.length === 2, name)
      assert(v.frames.forall(_.sameElements(frame)), name)
    }

    // -- malformed: all must reject with IllegalArgumentException --
    val rejected = Seq(
      "truncated header" -> good.take(20),
      "truncated movi (chunk len overruns list)" -> riff(hdrl ++
        list("movi", cc("00dc") ++ le(frame.length + 1000) ++ frame)),
      "negative chunk length" -> riff(hdrl ++
        list("movi", cc("00dc") ++ le(-8) ++ frame)),
      "zero-size 00dc as extra frame (count lie)" -> riff(hdrl ++ list("movi",
        chunk("00dc", frame) ++ chunk("00dc", frame) ++ chunk("00dc", Array.emptyByteArray))),
      "idx1 length not multiple of 16" -> riff(hdrl ++ movi2 ++
        chunk("idx1", Array.fill[Byte](10)(0))),
      "LIST too short for type fourcc" -> riff(hdrl ++
        cc("LIST") ++ le(2) ++ Array[Byte](0, 0) ++ movi2),
      "empty movi (no frames)" -> riff(hdrl ++ list("movi", Array.emptyByteArray)))
    rejected.foreach { case (name, bytes) =>
      withClue(name) {
        intercept[IllegalArgumentException](graft.ops.Avi.decodeMjpeg(bytes))
      }
    }
  }

  test("multimodal: dHash round-trips the container and flips locally") {
    import graft.ops.Multimodal
    // deterministic 9x8 gradient with row-alternating direction
    val base = Array.tabulate(72) { i =>
      val r = i / 9; val c = i % 9
      val v = if (r % 2 == 0) c * 20 else (8 - c) * 20
      v * 65536 + v * 256 + v
    }
    val (hi, lo) = Multimodal.dhashBmp(Multimodal.encodeBmp24(base, 9))
    // even comparison rows ascend (all 8 bits set), odd rows descend (0)
    assert(hi === 0x00ff00ffL && lo === 0x00ff00ffL)
    // flipping ONE pixel changes at most its two adjacent comparisons
    val mut = base.clone(); mut(4 * 9 + 3) = 255 * 65536 + 255 * 256 + 255
    val (hi2, lo2) = Multimodal.dhashBmp(Multimodal.encodeBmp24(mut, 9))
    val hamming = java.lang.Long.bitCount(hi ^ hi2) + java.lang.Long.bitCount(lo ^ lo2)
    assert(hamming >= 1 && hamming <= 2, s"local flip, got hamming $hamming")
    assert(hi2 === hi, "flip in row 4 must not touch the hi half")
    // non-9x8 payloads are rejected, not silently hashed
    intercept[IllegalArgumentException] {
      Multimodal.dhashBmp(Multimodal.encodeBmp24(Array.fill(64)(0), 8))
    }
  }

  test("Holt forecaster: exact on linear series, carry-forward fallbacks") {
    val h = new graft.batch.HoltForecaster(0.25, 0.25)
    // perfectly linear history → level/trend lock on exactly (alpha and
    // the data are exact binary, so every update is exact)
    val (mean, qs) = h.predict(Array(1.0, 2.0, 3.0, 4.0), 3, Seq(0.5))
    assert(mean.toSeq === Seq(5.0, 6.0, 7.0))
    assert(qs(0.5).toSeq === Seq(5.0, 6.0, 7.0), "quantiles collapse to mean")
    // two-point history: init consumes both, first update is a fixpoint
    val (m2, _) = h.predict(Array(0.0, 2.0), 2, Seq(0.5))
    assert(m2.toSeq === Seq(4.0, 6.0))
    // length-1 falls back to carry-forward; empty yields NaN
    assert(h.predict(Array(7.0), 2, Seq(0.5))._1.toSeq === Seq(7.0, 7.0))
    assert(h.predict(Array.empty[Double], 1, Seq(0.5))._1.forall(_.isNaN))
  }
}
