package graft.ops

import scala.collection.mutable

/** Pure-JVM GIF87a codec (8-bit grayscale palette, single frame, no
  * interlace) — the LZW member of the codec ladder (BMP/PGM uncompressed,
  * PNG/DEFLATE, JPEG/DCT, AVI container): real variable-width LZW with
  * dictionary growth, code-size bumps, the KwKwK case, and full-table
  * CLEAR cycles, not a stored-literal shortcut.
  *
  * Reference: the GIF87a/89a specification's image-data LZW (variable code
  * width starting at minCodeSize+1, LSB-first bit packing, CLEAR =
  * 1<<minCodeSize, END = CLEAR+1, table cap 4096, data in ≤255-byte
  * sub-blocks). Code-size synchronization follows the interoperating
  * classic pair: the ENCODER widens after the table grows past the current
  * width (next == 1<<width), the DECODER — whose table lags the encoder's
  * by exactly one entry at equal stream positions — widens one entry early
  * (next == (1<<width) − 1). The adversarial round-trip specs pin the
  * pairing at every boundary (512-entry width bump, 4096 clear cycle,
  * KwKwK runs).
  *
  * Scale shape: like the other codecs, encode/decode are per-row kernels —
  * media frames carry (id, bytes); decode runs inside the scan, no
  * exchange. Like reference media pipelines, pixels are opaque payload;
  * only integer features leave the decoder.
  */
object Gif {

  private val MinCodeSize = 8
  private val Clear = 1 << MinCodeSize // 256
  private val End = Clear + 1 // 257
  private val MaxSlots = 4096

  /** Encode 8-bit palette indices as a single-frame GIF87a (grayscale
    * global palette, index i → rgb(i,i,i)). Rows are `width` wide; the
    * last row is zero-padded. */
  def encodeGif8(indices: Array[Int], width: Int): Array[Byte] = {
    require(width > 0 && indices.nonEmpty, "need at least one pixel")
    val h = (indices.length + width - 1) / width
    val px = java.util.Arrays.copyOf(indices, width * h).map(_ & 0xff)
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    def shortLE(v: Int): Unit = { b(v); b(v >> 8) }
    out.write("GIF87a".getBytes("US-ASCII"))
    shortLE(width); shortLE(h)
    b(0xF7) // global color table, 8 bpp, 256 entries
    b(0); b(0) // background index, aspect
    var i = 0
    while (i < 256) { b(i); b(i); b(i); i += 1 } // grayscale palette
    b(0x2C) // image descriptor
    shortLE(0); shortLE(0); shortLE(width); shortLE(h)
    b(0) // no local table, not interlaced
    b(MinCodeSize)
    val lzw = compress(px)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      b(n); out.write(lzw, off, n); off += n
    }
    b(0) // block terminator
    b(0x3B) // trailer
    out.toByteArray
  }

  /** Decode a GIF87a/89a produced by [[encodeGif8]]-class encoders:
    * skips 89a extension blocks, rejects interlace and local palettes
    * (never emitted here), returns (width, height, indices). */
  def decodeGif8(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    var p = 0
    def u8(): Int = {
      require(p < bytes.length, s"truncated GIF at offset $p")
      val v = bytes(p) & 0xff; p += 1; v
    }
    def u16(): Int = { val lo = u8(); lo | (u8() << 8) }
    val magic = new String(bytes.slice(0, 6), "US-ASCII"); p = 6
    require(magic == "GIF87a" || magic == "GIF89a", s"bad GIF signature '$magic'")
    val sw = u16(); val sh = u16()
    val packed = u8(); u8(); u8()
    if ((packed & 0x80) != 0) p += 3 * (2 << (packed & 7)) // global palette
    // walk blocks to the first image descriptor
    var w = -1; var h = -1
    var done = false
    while (!done) {
      u8() match {
        case 0x2C =>
          u16(); u16(); w = u16(); h = u16()
          val ip = u8()
          require((ip & 0x40) == 0, "interlaced GIF not supported")
          if ((ip & 0x80) != 0) p += 3 * (2 << (ip & 7)) // local palette
          done = true
        case 0x21 => // 89a extension: label + sub-blocks
          u8()
          var n = u8()
          while (n != 0) { p += n; n = u8() }
        case 0x3B => throw new IllegalArgumentException("GIF has no image data")
        case other => throw new IllegalArgumentException(f"unexpected GIF block 0x$other%02x")
      }
    }
    require(w > 0 && h > 0 && w <= sw && h <= sh, s"bad image dims ${w}x$h in ${sw}x$sh")
    val minCode = u8()
    require(minCode == MinCodeSize, s"unsupported LZW min code size $minCode")
    val data = new java.io.ByteArrayOutputStream()
    var n = u8()
    while (n != 0) {
      require(p + n <= bytes.length, "truncated GIF sub-block")
      data.write(bytes, p, n); p += n; n = u8()
    }
    val px = decompress(data.toByteArray, w * h)
    require(px.length == w * h, s"LZW yielded ${px.length} pixels, expected ${w * h}")
    (w, h, px)
  }

  /** Summary features of a decoded GIF: (width, height, n_px, idx_sum) —
    * all order-independent exact longs. */
  def gifFeatures(bytes: Array[Byte]): (Int, Int, Long, Long) = {
    val (w, h, px) = decodeGif8(bytes)
    var s = 0L; var i = 0
    while (i < px.length) { s += px(i); i += 1 }
    (w, h, px.length.toLong, s)
  }

  /** Encode N same-sized frames as a multi-image GIF87a (one logical
    * screen, one global palette, one image block per frame — multi-image
    * is legal 87a; animation timing extensions are an 89a affordance the
    * features path doesn't need). */
  def encodeGifAnim(frames: Seq[Array[Int]], width: Int): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.nonEmpty), "need frames")
    val n = frames.map(_.length).max
    val h = (n + width - 1) / width
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    def shortLE(v: Int): Unit = { b(v); b(v >> 8) }
    out.write("GIF87a".getBytes("US-ASCII"))
    shortLE(width); shortLE(h); b(0xF7); b(0); b(0)
    var i = 0
    while (i < 256) { b(i); b(i); b(i); i += 1 }
    frames.foreach { f =>
      val px = java.util.Arrays.copyOf(f, width * h).map(_ & 0xff)
      b(0x2C); shortLE(0); shortLE(0); shortLE(width); shortLE(h); b(0)
      b(MinCodeSize)
      val lzw = compress(px)
      var off = 0
      while (off < lzw.length) {
        val m = math.min(255, lzw.length - off)
        b(m); out.write(lzw, off, m); off += m
      }
      b(0)
    }
    b(0x3B)
    out.toByteArray
  }

  /** Frame-sampled features: decode ONLY frames with index % stride == 0;
    * unsampled frames are skipped by hopping sub-block LENGTH bytes — no
    * LZW work, no pixel materialization (the m5 MJPEG property: sampling a
    * tenth of the frames costs a tenth of the entropy decode, which is the
    * whole economics of frame sampling at 100 TB).
    *
    * @return (frame, n_px, idx_sum) for each sampled frame. */
  def sampledFrameFeatures(bytes: Array[Byte], stride: Int): Seq[(Int, Long, Long)] = {
    require(stride >= 1, "stride >= 1")
    var p = 0
    def u8(): Int = {
      require(p < bytes.length, s"truncated GIF at offset $p")
      val v = bytes(p) & 0xff; p += 1; v
    }
    def u16(): Int = { val lo = u8(); lo | (u8() << 8) }
    val magic = new String(bytes.slice(0, 6), "US-ASCII"); p = 6
    require(magic == "GIF87a" || magic == "GIF89a", s"bad GIF signature '$magic'")
    u16(); u16()
    val packed = u8(); u8(); u8()
    if ((packed & 0x80) != 0) p += 3 * (2 << (packed & 7))
    val res = Seq.newBuilder[(Int, Long, Long)]
    var frame = 0
    var done = false
    while (!done) {
      u8() match {
        case 0x2C =>
          u16(); u16(); val w = u16(); val h = u16()
          val ip = u8()
          require((ip & 0x40) == 0, "interlaced GIF not supported")
          if ((ip & 0x80) != 0) p += 3 * (2 << (ip & 7))
          val minCode = u8()
          require(minCode == MinCodeSize, s"unsupported LZW min code size $minCode")
          if (frame % stride == 0) {
            val data = new java.io.ByteArrayOutputStream()
            var n = u8()
            while (n != 0) {
              require(p + n <= bytes.length, "truncated GIF sub-block")
              data.write(bytes, p, n); p += n; n = u8()
            }
            val px = decompress(data.toByteArray, w * h)
            require(px.length == w * h, s"frame $frame: ${px.length} px, expected ${w * h}")
            var s = 0L; var i = 0
            while (i < px.length) { s += px(i); i += 1 }
            res += ((frame, px.length.toLong, s))
          } else { // skip: hop sub-block lengths only — zero LZW work
            var n = u8()
            while (n != 0) { p += n; n = u8() }
          }
          frame += 1
        case 0x21 =>
          u8(); var n = u8(); while (n != 0) { p += n; n = u8() }
        case 0x3B => done = true
        case other => throw new IllegalArgumentException(f"unexpected GIF block 0x$other%02x")
      }
    }
    res.result()
  }

  // ---- variable-width LZW ----

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0L
    private var nbits = 0
    def put(code: Int, width: Int): Unit = {
      cur |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) { buf.write((cur & 0xff).toInt); cur >>= 8; nbits -= 8 }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) buf.write((cur & 0xff).toInt)
      buf.toByteArray
    }
  }

  private def compress(px: Array[Int]): Array[Byte] = {
    val w = new BitWriter
    var width = MinCodeSize + 1
    var next = End + 1
    // (prefixCode << 8 | byte) → code; prefix < 4096, byte < 256 → unique key
    val dict = new mutable.LongMap[Int](1 << 13)
    def reset(): Unit = { dict.clear(); next = End + 1; width = MinCodeSize + 1 }
    w.put(Clear, width)
    var prefix = px(0)
    var i = 1
    while (i < px.length) {
      val c = px(i)
      val key = (prefix.toLong << 8) | c
      dict.get(key) match {
        case Some(code) => prefix = code
        case None =>
          w.put(prefix, width)
          if (next < MaxSlots) {
            dict(key) = next; next += 1
            if (next == (1 << width) && width < 12) width += 1
          } else { // table full: start a fresh cycle
            w.put(Clear, width)
            reset()
          }
          prefix = c
      }
      i += 1
    }
    w.put(prefix, width)
    w.put(End, width)
    w.finish()
  }

  private def decompress(data: Array[Byte], expected: Int): Array[Int] = {
    val out = new mutable.ArrayBuilder.ofInt
    out.sizeHint(expected)
    var cur = 0L; var nbits = 0; var p = 0
    var width = MinCodeSize + 1
    def read(): Int = {
      while (nbits < width) {
        require(p < data.length, "truncated LZW stream (no END code)")
        cur |= (data(p) & 0xffL) << nbits; p += 1; nbits += 8
      }
      val v = (cur & ((1L << width) - 1)).toInt
      cur >>= width; nbits -= width
      v
    }
    // dictionary as (prefix pointer, last byte) pairs — O(1) adds, entries
    // materialized back-to-front only when emitted
    val prefixOf = new Array[Int](MaxSlots)
    val lastOf = new Array[Int](MaxSlots)
    var next = End + 1
    def emit(code: Int): Int = { // returns first byte of the expansion
      var stack = List.empty[Int]
      var c = code
      while (c >= Clear + 2) { stack = lastOf(c) :: stack; c = prefixOf(c) }
      stack = c :: stack
      stack.foreach(out += _)
      c
    }
    var prev = -1
    var stop = false
    while (!stop) {
      val code = read()
      if (code == Clear) { next = End + 1; width = MinCodeSize + 1; prev = -1 }
      else if (code == End) stop = true
      else if (code < 256 || (code >= Clear + 2 && code < next)) {
        val first = emit(code)
        if (prev >= 0 && next < MaxSlots) {
          prefixOf(next) = prev; lastOf(next) = first; next += 1
          if (next == (1 << width) - 1 && width < 12) width += 1
        }
        prev = code
      } else if (code == next && prev >= 0) { // KwKwK
        // expansion = expand(prev) + firstByte(expand(prev))
        var c = prev
        while (c >= Clear + 2) c = prefixOf(c)
        val first = c
        prefixOf(next) = prev; lastOf(next) = first
        emit(next)
        next += 1
        if (next == (1 << width) - 1 && width < 12) width += 1
        prev = code
      } else {
        throw new IllegalArgumentException(
          s"corrupt LZW: code $code with table size $next")
      }
    }
    out.result()
  }
}
