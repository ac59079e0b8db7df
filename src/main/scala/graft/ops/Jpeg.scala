package graft.ops

/** Baseline sequential JPEG (ITU-T T.81), pure JVM, zero deps — the
  * encode/decode pair for the most common real multimodal container.
  * Spec scope: 8-bit precision, grayscale and 3-component YCbCr with
  * arbitrary baseline sampling factors 1..4 on decode (4:4:4 and the
  * dominant 4:2:0 on encode), interleaved MCUs, standard Annex K luminance
  * Huffman tables (carried in-file via DHT, as required), byte-stuffed
  * entropy coding, full run-length / EOB / ZRL AC coding, naive separable
  * double-precision DCT. Subsampled components upsample by replication.
  *
  * Exactness contract for the oracle fixtures: with the all-ones
  * quantization table this codec round-trips any image whose 8×8 blocks are
  * each UNIFORM exactly (a constant block has one DC coefficient — integer
  * after the ×8 DCT gain — and mathematically zero ACs, so nothing is lost
  * to coefficient rounding). [[encodeGrayBlocks]] builds exactly such
  * images. Arbitrary images round-trip approximately (coefficient rounding
  * ≤ 0.5 each), like any quality-100 baseline JPEG.
  *
  * Reference repo analog: none — the reference pipeline has no image path;
  * this extends the engine's multimodal surface (SURVEY §2.9 extras)
  * alongside the BMP/PNG/WAV codecs in [[Multimodal]].
  */
object Jpeg {

  /** Zigzag scan: position i in scan order → natural index (row*8+col). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Standard luminance DC table (T.81 Annex K.3.1): code-length counts
    * for lengths 1..16, then the symbols (categories 0..11). */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray

  /** Standard luminance AC table (Annex K.3.2). */
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical codes from (bits, vals): symbol → (code, length). */
  private def encodeTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out
  }

  /** Decode-side canonical table: per-length (minCode, maxCode, valPtr). */
  private final class DecodeTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len - 1); k += bits(len - 1)
        maxCode(len) = code - 1 // -1 when no codes of this length
        if (bits(len - 1) == 0) maxCode(len) = -1
        code <<= 1
      }
    }
    def decode(in: BitReader): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | in.bit()
        len += 1
        if (maxCode(len) >= 0 && code <= maxCode(len) && code >= minCode(len))
          return vals(valPtr(len) + code - minCode(len))
      }
      throw new IllegalArgumentException("invalid Huffman code")
    }
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) {
      val pad = (acc << (8 - n)) | ((1 << (8 - n)) - 1) // pad with 1s
      out.write(pad)
      if (pad == 0xff) out.write(0x00)
      acc = 0; n = 0
    }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        require(pos < bytes.length, "truncated entropy stream")
        val b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "truncated after 0xff")
          val m = bytes(pos) & 0xff
          require(m == 0x00, f"unexpected marker ff$m%02x inside scan")
          pos += 1 // stuffed zero
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def receive(k: Int): Int = {
      var v = 0; var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  /** Sign-extend a `size`-bit magnitude per T.81 F.2.2.1. */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0 else if (v < (1 << (size - 1))) v - (1 << size) + 1 else v

  /** Bit category of a value (0 for 0, else bits of |v|). */
  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  private val CosT = Array.tabulate(8, 8)((u, x) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private def cN(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Forward DCT, natural-order in/out, block indexed [y*8+x] / [v*8+u].
    * Separable row-column form: 2·8·64 multiplies per block instead of the
    * direct form's 64·64 — this is the per-pixel hot loop of every JPEG
    * encode and (via [[idct]]) decode. */
  private def fdct(f: Array[Double]): Array[Double] = {
    val rowT = new Array[Double](64) // rowT(y*8+u) = Σ_x f(y,x)·cos_u(x)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < 8) { s += f(y * 8 + x) * CosT(u)(x); x += 1 }
        rowT(y * 8 + u) = s; u += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var yy = 0
        while (yy < 8) { s += rowT(yy * 8 + u) * CosT(v)(yy); yy += 1 }
        out(v * 8 + u) = 0.25 * cN(u) * cN(v) * s; u += 1
      }
      v += 1
    }
    out
  }

  /** Inverse DCT, separable like [[fdct]]. */
  private def idct(coef: Array[Double]): Array[Double] = {
    val rowT = new Array[Double](64) // rowT(v*8+x) = Σ_u c(u)·F(v,u)·cos_u(x)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += cN(u) * coef(v * 8 + u) * CosT(u)(x); u += 1 }
        rowT(v * 8 + x) = s; x += 1
      }
      v += 1
    }
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var vv = 0
        while (vv < 8) { s += cN(vv) * rowT(vv * 8 + x) * CosT(vv)(y); vv += 1 }
        out(y * 8 + x) = 0.25 * s; x += 1
      }
      y += 1
    }
    out
  }

  private def u16(hi: Int, lo: Int): Array[Byte] = Array(hi.toByte, lo.toByte)
  private def be16(v: Int): Array[Byte] = Array((v >> 8).toByte, (v & 0xff).toByte)

  /** Entropy-encode one level-shifted block: FDCT, quantize (q=1), zigzag,
    * DC-diff + AC run-length Huffman. Returns the block's DC for the next
    * block's predictor. */
  private def writeBlock(bw: BitWriter, block: Array[Double], prevDc: Int,
                         dcCodes: Array[(Int, Int)], acCodes: Array[(Int, Int)]): Int = {
    val coef = fdct(block)
    // quantize (q=1) in zigzag order; AC magnitudes clamp at the standard
    // table's size-10 ceiling (reachable only by adversarial ±128
    // checkerboards — the same bound real quality-100 encoders hit)
    val zz = Array.tabulate(64)(i => {
      val q = math.round(coef(Zigzag(i))).toInt
      if (i == 0) q else math.max(-1023, math.min(1023, q))
    })
    val diff = zz(0) - prevDc
    val dcCat = category(diff)
    val (dcode, dlen) = dcCodes(dcCat)
    bw.put(dcode, dlen)
    if (dcCat > 0)
      bw.put(if (diff < 0) diff + (1 << dcCat) - 1 else diff, dcCat)
    var k = 1
    var run = 0
    while (k < 64) {
      if (zz(k) == 0) run += 1
      else {
        while (run >= 16) {
          val (zc, zl) = acCodes(0xf0); bw.put(zc, zl); run -= 16 // ZRL
        }
        val size = category(zz(k))
        val (c, l) = acCodes((run << 4) | size)
        bw.put(c, l)
        bw.put(if (zz(k) < 0) zz(k) + (1 << size) - 1 else zz(k), size)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (c, l) = acCodes(0x00); bw.put(c, l) } // EOB
    zz(0)
  }

  /** Copy the 8×8 block at (bx, by) of a full-res plane into `block`,
    * level-shifted; out-of-image positions are zero-padded. */
  private def fillBlock(plane: Array[Double], width: Int, height: Int,
                        bx: Int, by: Int, block: Array[Double]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val px = bx * 8 + x; val py = by * 8 + y
        block(y * 8 + x) =
          if (px < width && py < height) plane(py * width + px) - 128.0 else -128.0
        x += 1
      }
      y += 1
    }
  }

  /** Shared headers + interleaved-MCU entropy coding for 1 (gray) or 3
    * (YCbCr) planes, all using the standard luminance tables and the
    * all-ones quant table. `sampling(c) = (h_c, v_c)`; `planes(c)` holds the
    * component at its OWN resolution ceil(width·h_c/hMax) ×
    * ceil(height·v_c/vMax) per T.81 A.1.1 (full-res for 4:4:4, half-res
    * chroma for 4:2:0). Blocks are written in MCU order: per MCU, each
    * component's v_c×h_c blocks in raster order. */
  private def encodePlanes(planes: Seq[Array[Double]], width: Int, height: Int,
                           sampling: Seq[(Int, Int)]): Array[Byte] = {
    val nComp = planes.length
    require(nComp == 1 || nComp == 3, "1 or 3 components")
    require(sampling.length == nComp && sampling.forall { case (h, v) =>
      h >= 1 && h <= 4 && v >= 1 && v <= 4 }, "sampling factors must be 1..4")
    // SOF dimensions are 16-bit fields; larger dims would silently
    // truncate mod 65536 into a structurally valid but wrong JPEG.
    require(width >= 1 && width <= 65535 && height >= 1 && height <= 65535,
      s"JPEG dimensions must be in [1, 65535], got ${width}x$height")
    val hMax = sampling.map(_._1).max
    val vMax = sampling.map(_._2).max
    def cw(c: Int): Int = (width * sampling(c)._1 + hMax - 1) / hMax
    def ch(c: Int): Int = (height * sampling(c)._2 + vMax - 1) / vMax
    (0 until nComp).foreach(c => require(planes(c).length == cw(c) * ch(c),
      s"component $c plane must be ${cw(c)}x${ch(c)}"))
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, body: Array[Byte]): Unit = {
      out.write(u16(0xff, marker), 0, 2)
      out.write(be16(body.length + 2), 0, 2)
      out.write(body, 0, body.length)
    }
    out.write(u16(0xff, 0xd8), 0, 2) // SOI
    seg(0xdb, 0x00.toByte +: Array.fill(64)(1.toByte)) // DQT: Pq=0,Tq=0, q=1
    val sofComps = (0 until nComp).flatMap(c => Seq((c + 1).toByte,
      ((sampling(c)._1 << 4) | sampling(c)._2).toByte, 0.toByte))
    seg(0xc0, (Array[Byte](8) ++ be16(height) ++ be16(width) ++
      Array(nComp.toByte)) ++ sofComps) // SOF0, Tq=0 for all
    seg(0xc4, 0x00.toByte +: (DcBits.map(_.toByte) ++ DcVals.map(_.toByte)))
    seg(0xc4, 0x10.toByte +: (AcBits.map(_.toByte) ++ AcVals.map(_.toByte)))
    val sosComps = (1 to nComp).flatMap(id => Seq(id.toByte, 0x00.toByte))
    seg(0xda, (Array(nComp.toByte) ++ sosComps) ++ Array[Byte](0, 63, 0)) // SOS

    val dcCodes = encodeTable(DcBits, DcVals)
    val acCodes = encodeTable(AcBits, AcVals)
    val bw = new BitWriter(out)
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val prevDc = new Array[Int](nComp) // per-component DC predictors
    val block = new Array[Double](64)
    for (my <- 0 until mcusY; mx <- 0 until mcusX; c <- 0 until nComp;
         bv <- 0 until sampling(c)._2; bh <- 0 until sampling(c)._1) {
      fillBlock(planes(c), cw(c), ch(c),
        mx * sampling(c)._1 + bh, my * sampling(c)._2 + bv, block)
      prevDc(c) = writeBlock(bw, block, prevDc(c), dcCodes, acCodes)
    }
    bw.flush()
    out.write(u16(0xff, 0xd9), 0, 2) // EOI
    out.toByteArray
  }

  /** All-components-full-resolution form (grayscale / YCbCr 4:4:4). */
  private def encodePlanes(planes: Seq[Array[Double]], width: Int, height: Int): Array[Byte] =
    encodePlanes(planes, width, height, planes.map(_ => (1, 1)))

  /** Encode an 8-bit grayscale image as baseline JPEG with an all-ones
    * quantization table (quality-lossless coefficient storage). Image dims
    * need not be block-aligned; partial edge blocks are zero-padded (those
    * blocks then round-trip approximately — see class doc). */
  def encodeGray(gray: Array[Int], width: Int): Array[Byte] = {
    require(width > 0 && gray.nonEmpty, "empty image")
    val height = (gray.length + width - 1) / width
    val plane = new Array[Double](width * height)
    var i = 0
    while (i < plane.length) {
      plane(i) = if (i < gray.length) (gray(i) & 0xff).toDouble else 0.0
      i += 1
    }
    encodePlanes(Seq(plane), width, height)
  }

  /** Encode packed 0xRRGGBB pixels as a baseline COLOR JPEG (YCbCr 4:4:4,
    * no chroma subsampling). The JFIF color transform rounds through
    * doubles, so color round-trips are near-exact (±2/channel), never
    * bit-exact — use the grayscale path where an exact oracle is needed. */
  def encodeColor(rgb: Array[Int], width: Int): Array[Byte] = {
    require(width > 0 && rgb.nonEmpty, "empty image")
    val height = (rgb.length + width - 1) / width
    val n = width * height
    val yP = new Array[Double](n)
    val cbP = new Array[Double](n)
    val crP = new Array[Double](n)
    var i = 0
    while (i < n) {
      val p = if (i < rgb.length) rgb(i) else 0
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      yP(i) = 0.299 * r + 0.587 * g + 0.114 * b
      cbP(i) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
      crP(i) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
      i += 1
    }
    encodePlanes(Seq(yP, cbP, crP), width, height)
  }

  /** Encode packed 0xRRGGBB pixels as baseline YCbCr **4:2:0** — 2×2 chroma
    * subsampling, the dominant sampling of real multimodal corpora. Chroma
    * is box-averaged over each 2×2 cell (edge cells average the pixels they
    * cover), so an image uniform per 16×16 MCU loses nothing to
    * subsampling and round-trips through [[decodeRgb]]'s replication
    * upsample the way the 4:4:4 uniform-block fixtures do. */
  def encodeColor420(rgb: Array[Int], width: Int): Array[Byte] = {
    require(width > 0 && rgb.nonEmpty, "empty image")
    val height = (rgb.length + width - 1) / width
    val n = width * height
    val yP = new Array[Double](n)
    val cwHalf = (width + 1) / 2
    val chHalf = (height + 1) / 2
    val cbSum = new Array[Double](cwHalf * chHalf)
    val crSum = new Array[Double](cwHalf * chHalf)
    val cnt = new Array[Int](cwHalf * chHalf)
    var i = 0
    while (i < n) {
      val p = if (i < rgb.length) rgb(i) else 0
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      yP(i) = 0.299 * r + 0.587 * g + 0.114 * b
      val ci = (i / width / 2) * cwHalf + (i % width / 2)
      cbSum(ci) += -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
      crSum(ci) += 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
      cnt(ci) += 1
      i += 1
    }
    val cbP = Array.tabulate(cwHalf * chHalf)(j => cbSum(j) / cnt(j))
    val crP = Array.tabulate(cwHalf * chHalf)(j => crSum(j) / cnt(j))
    encodePlanes(Seq(yP, cbP, crP), width, height, Seq((2, 2), (1, 1), (1, 1)))
  }

  /** One uniform 16×16 MCU per input 0xRRGGBB value (the 4:2:0 oracle-exact
    * fixture shape, the color analog of [[encodeGrayBlocks]]): image width
    * 16·widthMcus, trailing MCUs of the last row black. Uniform MCUs keep
    * every block in BOTH tiers uniform after the chroma box average, so
    * primary-color content decodes with exact channel counts. */
  def encodeColorMcus(colors: Array[Int], widthMcus: Int): Array[Byte] = {
    val rows = (colors.length + widthMcus - 1) / widthMcus
    val w = widthMcus * 16
    val rgb = new Array[Int](w * rows * 16)
    colors.indices.foreach { i =>
      val mx = i % widthMcus; val my = i / widthMcus
      var y = 0
      while (y < 16) {
        var x = 0
        while (x < 16) { rgb((my * 16 + y) * w + mx * 16 + x) = colors(i); x += 1 }
        y += 1
      }
    }
    encodeColor420(rgb, w)
  }

  /** One uniform 8×8 block per input value (the oracle-exact fixture shape):
    * image width 8·widthBlocks, trailing blocks of the last row black. */
  def encodeGrayBlocks(vals: Array[Int], widthBlocks: Int): Array[Byte] = {
    val rows = (vals.length + widthBlocks - 1) / widthBlocks
    val w = widthBlocks * 8
    val gray = new Array[Int](w * rows * 8)
    vals.indices.foreach { i =>
      val bx = i % widthBlocks; val by = i / widthBlocks
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) { gray((by * 8 + y) * w + bx * 8 + x) = vals(i) & 0xff; x += 1 }
        y += 1
      }
    }
    encodeGray(gray, w)
  }

  /** Decoded full-resolution component planes plus dimensions. */
  private final case class Decoded(width: Int, height: Int, planes: Seq[Array[Int]])

  /** Parse + entropy-decode a baseline JPEG: 8-bit, 1 or 3 components,
    * sampling factors 1..4 (4:4:4, 4:2:0, 4:2:2, ...), interleaved MCUs,
    * no restart intervals. Returns full-resolution planes (subsampled
    * components upsampled by replication). */
  private def decodePlanes(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG (no SOI)")
    var pos = 2
    var width = 0; var height = 0
    // per-component (in SOF order): id, sampling factors, quant-table id;
    // scan tables by id
    var compIds: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compTq: Array[Int] = null
    var scanDcId: Array[Int] = null
    var scanAcId: Array[Int] = null
    val dhtTables = scala.collection.mutable.Map[Int, DecodeTable]()
    val dqtTables = scala.collection.mutable.Map[Int, Array[Int]]()

    def u8(i: Int): Int = { require(i < bytes.length, "truncated segment"); bytes(i) & 0xff }
    def u16at(i: Int): Int = (u8(i) << 8) | u8(i + 1)

    var inScan = false
    while (!inScan) {
      require(u8(pos) == 0xff, f"expected marker at $pos, got ${u8(pos)}%02x")
      val marker = u8(pos + 1)
      pos += 2
      marker match {
        case 0xd9 => throw new IllegalArgumentException("EOI before scan data")
        case m if m >= 0xd0 && m <= 0xd7 => // RSTn outside scan: ignore
        case 0xc0 => // SOF0 baseline
          val len = u16at(pos)
          require(u8(pos + 2) == 8, "only 8-bit precision")
          height = u16at(pos + 3); width = u16at(pos + 5)
          val nComp = u8(pos + 7)
          require(nComp == 1 || nComp == 3, s"unsupported component count $nComp")
          compIds = new Array[Int](nComp)
          compH = new Array[Int](nComp)
          compV = new Array[Int](nComp)
          compTq = new Array[Int](nComp)
          for (c <- 0 until nComp) {
            compIds(c) = u8(pos + 8 + 3 * c)
            val hv = u8(pos + 9 + 3 * c)
            compH(c) = hv >> 4; compV(c) = hv & 0x0f
            require(compH(c) >= 1 && compH(c) <= 4 && compV(c) >= 1 && compV(c) <= 4,
              f"sampling factors must be 1..4, got $hv%02x")
            compTq(c) = u8(pos + 10 + 3 * c)
          }
          pos += len
        case 0xc4 => // DHT (possibly several tables in one segment)
          val len = u16at(pos)
          var p = pos + 2
          while (p < pos + len) {
            val tcTh = u8(p)
            val bits = Array.tabulate(16)(i => u8(p + 1 + i))
            val nVals = bits.sum
            val vals = Array.tabulate(nVals)(i => u8(p + 17 + i))
            dhtTables((tcTh >> 4) * 4 + (tcTh & 0x0f)) = new DecodeTable(bits, vals)
            p += 17 + nVals
          }
          pos += len
        case 0xdb => // DQT
          val len = u16at(pos)
          var p = pos + 2
          while (p < pos + len) {
            val pqTq = u8(p)
            require((pqTq >> 4) == 0, "only 8-bit quant tables")
            dqtTables(pqTq & 0x0f) = Array.tabulate(64)(i => u8(p + 1 + i))
            p += 65
          }
          pos += len
        case 0xda => // SOS
          val len = u16at(pos)
          val ns = u8(pos + 2)
          require(compIds != null && ns == compIds.length,
            "scan must cover all SOF components (interleaved baseline)")
          scanDcId = new Array[Int](ns)
          scanAcId = new Array[Int](ns)
          for (c <- 0 until ns) {
            val sid = u8(pos + 3 + 2 * c)
            val ci = compIds.indexOf(sid)
            require(ci >= 0, s"scan component $sid not in SOF")
            scanDcId(ci) = u8(pos + 4 + 2 * c) >> 4
            scanAcId(ci) = u8(pos + 4 + 2 * c) & 0x0f
          }
          pos += len
          inScan = true
        case 0xdd => // DRI
          require(u16at(pos + 2) == 0, "restart intervals unsupported")
          pos += u16at(pos)
        case 0xc2 => throw new IllegalArgumentException("progressive JPEG unsupported")
        case _ => pos += u16at(pos) // APPn / COM / other: skip
      }
    }
    require(width > 0 && height > 0, "missing SOF0")
    val nComp = compIds.length
    val quants = compTq.map(tq => dqtTables.getOrElse(tq,
      throw new IllegalArgumentException("missing DQT")))
    val dcTabs = scanDcId.map(id => dhtTables.getOrElse(id,
      throw new IllegalArgumentException("missing DC DHT")))
    val acTabs = scanAcId.map(id => dhtTables.getOrElse(4 + id,
      throw new IllegalArgumentException("missing AC DHT")))

    val br = new BitReader(bytes, pos)
    val hMax = compH.max
    val vMax = compV.max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // per-component MCU-padded planes at the component's OWN resolution
    // (T.81 A.1.1); 1×1 chroma under a 2×2 luma is half-res — 4:2:0
    val subW = Array.tabulate(nComp)(c => mcusX * compH(c) * 8)
    val subH = Array.tabulate(nComp)(c => mcusY * compV(c) * 8)
    val sub = Array.tabulate(nComp)(c => new Array[Int](subW(c) * subH(c)))
    val prevDc = new Array[Int](nComp)
    for (my <- 0 until mcusY; mx <- 0 until mcusX; c <- 0 until nComp;
         bv <- 0 until compV(c); bh <- 0 until compH(c)) {
      val zz = new Array[Int](64)
      val dcCat = dcTabs(c).decode(br)
      prevDc(c) += extend(br.receive(dcCat), dcCat)
      zz(0) = prevDc(c)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val sym = acTabs(c).decode(br)
        if (sym == 0x00) eob = true
        else if (sym == 0xf0) k += 16
        else {
          k += sym >> 4
          require(k < 64, "AC run past block end")
          zz(k) = extend(br.receive(sym & 0x0f), sym & 0x0f)
          k += 1
        }
      }
      val coef = new Array[Double](64)
      var i = 0
      while (i < 64) { coef(Zigzag(i)) = zz(i).toDouble * quants(c)(i); i += 1 }
      val px = idct(coef)
      val ox = (mx * compH(c) + bh) * 8; val oy = (my * compV(c) + bv) * 8
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val v = math.round(px(y * 8 + x) + 128.0).toInt
          sub(c)((oy + y) * subW(c) + (ox + x)) = math.max(0, math.min(255, v))
          x += 1
        }
        y += 1
      }
    }
    // crop + upsample every component to full resolution by replication
    // (nearest-neighbor — the inverse of encodeColor420's box average on
    // cell-uniform content); full-res components just crop the MCU pad
    val planes = Array.tabulate(nComp) { c =>
      val p = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        val sy = y * compV(c) / vMax
        var x = 0
        while (x < width) {
          p(y * width + x) = sub(c)(sy * subW(c) + x * compH(c) / hMax)
          x += 1
        }
        y += 1
      }
      p
    }
    Decoded(width, height, planes.toSeq)
  }

  /** Decode a baseline grayscale JPEG: (width, height, row-major pixels). */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val d = decodePlanes(bytes)
    require(d.planes.length == 1, "not a grayscale JPEG")
    (d.width, d.height, d.planes.head)
  }

  /** Decode a baseline 1- or 3-component JPEG to packed 0xRRGGBB pixels
    * (gray replicated across channels; YCbCr converted per JFIF after
    * upsampling any subsampled component to full resolution). */
  def decodeRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val d = decodePlanes(bytes)
    val out = new Array[Int](d.width * d.height)
    if (d.planes.length == 1) {
      val g = d.planes.head
      var i = 0
      while (i < out.length) { out(i) = (g(i) << 16) | (g(i) << 8) | g(i); i += 1 }
    } else {
      val Seq(yP, cbP, crP) = d.planes
      var i = 0
      while (i < out.length) {
        val y = yP(i).toDouble; val cb = cbP(i) - 128.0; val cr = crP(i) - 128.0
        def clamp(v: Double): Int = math.max(0, math.min(255, math.round(v).toInt))
        val r = clamp(y + 1.402 * cr)
        val g = clamp(y - 0.344136 * cb - 0.714136 * cr)
        val b = clamp(y + 1.772 * cb)
        out(i) = (r << 16) | (g << 8) | b
        i += 1
      }
    }
    (d.width, d.height, out)
  }
}
