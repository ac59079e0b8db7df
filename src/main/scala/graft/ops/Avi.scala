package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal Motion-JPEG AVI container codec (pure JVM, no media libraries).
  *
  * AVI is RIFF: a `RIFF/AVI ` envelope holding a `hdrl` LIST (the `avih`
  * main header plus one `strl` stream list with `strh`/`strf`), a `movi`
  * LIST whose `00dc` chunks each carry one complete baseline JPEG
  * ([[graft.ops.Jpeg]]), and an `idx1` index. Every frame is a keyframe —
  * the defining property of MJPEG — so frame sampling can decode any subset
  * without inter-frame state, which is exactly what a distributed
  * frame-sampling pipeline needs: tasks seek straight to sampled chunks.
  *
  * The writer emits the strict layout above; the reader walks the chunk
  * tree defensively (`require` on every fourcc/size) and tolerates unknown
  * chunks, odd-size padding, and a missing `idx1` (index-less AVIs are
  * legal). Container round-trips are byte-lossless over the frame payloads;
  * fidelity of the pixels themselves is the JPEG codec's contract.
  *
  * Like the BMP/WAV/PNG/JPEG codecs this backs the multimodal `binary`
  * column family (SURVEY §2 training-pipeline extensions); the reference
  * pipeline has no video path, so semantics follow the image-features
  * family (m1-m4) extended with frame sampling.
  */
object Avi {

  /** A decoded MJPEG AVI: nominal dims/fps from `avih`, one JPEG payload
    * per frame in stream order. */
  final case class MjpegAvi(width: Int, height: Int, microSecPerFrame: Int,
                            frames: IndexedSeq[Array[Byte]],
                            rate: Int = 0, scale: Int = 0) {
    /** Exact `dwRate/dwScale` from `strh` when present, else the avih
      * reciprocal — 1e6/fps rarely divides evenly, so the reciprocal alone
      * round-trips 30 fps as 30.00003. */
    def fps: Double =
      if (rate > 0 && scale > 0) rate.toDouble / scale
      else if (microSecPerFrame <= 0) 0.0 else 1e6 / microSecPerFrame
  }

  private val AVIF_HASINDEX = 0x10
  private val AVIIF_KEYFRAME = 0x10

  private def fourcc(s: String): Int = {
    require(s.length == 4, s"fourcc '$s'")
    (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) | ((s(3) & 0xff) << 24)
  }

  /** Encode JPEG frame payloads as an MJPEG AVI. `width`/`height` are the
    * nominal display dims recorded in the headers (per-frame JPEGs carry
    * their own exact dims); `fps` fixes `dwMicroSecPerFrame`. */
  def encodeMjpeg(frames: Seq[Array[Byte]], width: Int, height: Int,
                  fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "empty video")
    require(width > 0 && height > 0 && fps > 0, s"bad dims/fps $width x $height @$fps")
    val paddedSizes = frames.map(f => f.length + (f.length & 1))
    val moviSize = 4 + paddedSizes.map(_ + 8).sum // 'movi' + chunks
    val idx1Size = 16 * frames.length
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40)) // 'hdrl' avih LIST(strl strh strf)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    val bb = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)

    bb.putInt(fourcc("RIFF")).putInt(riffSize).putInt(fourcc("AVI "))

    bb.putInt(fourcc("LIST")).putInt(hdrlSize).putInt(fourcc("hdrl"))
    bb.putInt(fourcc("avih")).putInt(56)
    // rcFrame carries dims as int16; the avih field is advisory but a
    // wrapped short would mislead readers, so bound dims here.
    require(width >= 1 && width <= 32767 && height >= 1 && height <= 32767,
      s"AVI dimensions must be in [1, 32767], got ${width}x$height")
    // Rounded, not truncated: 1e6/30 = 33333.33 — truncation round-trips
    // as fps 30.00003. strh's exact dwScale/dwRate remains authoritative.
    val usPerFrame = ((1000000L + fps / 2) / fps).toInt
    bb.putInt(usPerFrame)                     // dwMicroSecPerFrame
      .putInt(0)                              // dwMaxBytesPerSec (advisory)
      .putInt(0)                              // dwPaddingGranularity
      .putInt(AVIF_HASINDEX)                  // dwFlags
      .putInt(frames.length)                  // dwTotalFrames
      .putInt(0)                              // dwInitialFrames
      .putInt(1)                              // dwStreams
      .putInt(paddedSizes.max)                // dwSuggestedBufferSize
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved

    bb.putInt(fourcc("LIST")).putInt(4 + (8 + 56) + (8 + 40)).putInt(fourcc("strl"))
    bb.putInt(fourcc("strh")).putInt(56)
    bb.putInt(fourcc("vids")).putInt(fourcc("MJPG"))
      .putInt(0).putInt(0)                    // dwFlags, wPriority|wLanguage
      .putInt(0)                              // dwInitialFrames
      .putInt(1).putInt(fps)                  // dwScale / dwRate = fps
      .putInt(0)                              // dwStart
      .putInt(frames.length)                  // dwLength (in frames)
      .putInt(paddedSizes.max)                // dwSuggestedBufferSize
      .putInt(-1)                             // dwQuality (default)
      .putInt(0)                              // dwSampleSize (0: varies)
      .putShort(0).putShort(0)                // rcFrame left, top
      .putShort(width.toShort).putShort(height.toShort)
    bb.putInt(fourcc("strf")).putInt(40)      // BITMAPINFOHEADER
    bb.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)               // biPlanes, biBitCount
      .putInt(fourcc("MJPG"))                 // biCompression
      .putInt(width * height * 3)             // biSizeImage (nominal)
      .putInt(0).putInt(0).putInt(0).putInt(0)

    bb.putInt(fourcc("LIST")).putInt(moviSize).putInt(fourcc("movi"))
    // idx1 offsets are relative to the first byte after the 'movi' fourcc
    // (chunk offsets within the list body), the convention modern readers
    // accept for files they also index by absolute scan.
    val offsets = new Array[Int](frames.length)
    var rel = 4
    frames.indices.foreach { i =>
      offsets(i) = rel
      bb.putInt(fourcc("00dc")).putInt(frames(i).length).put(frames(i))
      if ((frames(i).length & 1) == 1) bb.put(0.toByte)
      rel += 8 + paddedSizes(i)
    }

    bb.putInt(fourcc("idx1")).putInt(idx1Size)
    frames.indices.foreach { i =>
      bb.putInt(fourcc("00dc")).putInt(AVIIF_KEYFRAME)
        .putInt(offsets(i)).putInt(frames(i).length)
    }
    bb.array()
  }

  /** Parse an MJPEG AVI. Walks the RIFF tree, takes dims/fps/frame-count
    * from `avih`, requires the single video stream to declare the MJPG
    * handler, and returns `00dc`/`00db` chunk payloads in stream order.
    * Unknown chunks are skipped; `idx1`, when present, must agree with the
    * scanned frame count. */
  def decodeMjpeg(bytes: Array[Byte]): MjpegAvi = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12, "truncated AVI")
    require(bb.getInt(0) == fourcc("RIFF"), "not a RIFF file")
    val riffSize = bb.getInt(4)
    require(riffSize >= 4 && 8L + riffSize <= bytes.length, s"bad RIFF size $riffSize")
    require(bb.getInt(8) == fourcc("AVI "), "RIFF is not AVI")

    var width = 0; var height = 0; var usPerFrame = 0; var totalFrames = -1
    var rateScale = (0, 0)
    var handlerOk = false
    var idxCount = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    // Walks the chunks of one list body [pos, end); descends into LISTs.
    def walk(pos0: Int, end: Int, inMovi: Boolean): Unit = {
      var pos = pos0
      while (pos + 8 <= end) {
        val id = bb.getInt(pos)
        val len = bb.getInt(pos + 4)
        require(len >= 0 && pos + 8L + len <= end, s"chunk overruns list (len $len at $pos)")
        if (id == fourcc("LIST")) {
          require(len >= 4, "LIST too short for a type fourcc")
          val listType = bb.getInt(pos + 8)
          walk(pos + 12, pos + 8 + len, inMovi = listType == fourcc("movi"))
        } else if (id == fourcc("avih")) {
          require(len >= 56, s"avih length $len < 56")
          usPerFrame = bb.getInt(pos + 8)
          totalFrames = bb.getInt(pos + 24)
          width = bb.getInt(pos + 40)
          height = bb.getInt(pos + 44)
        } else if (id == fourcc("strh")) {
          require(len >= 56, s"strh length $len < 56")
          if (bb.getInt(pos + 8) == fourcc("vids")) {
            require(bb.getInt(pos + 12) == fourcc("MJPG"), "video stream is not MJPG")
            handlerOk = true
            rateScale = (bb.getInt(pos + 32), bb.getInt(pos + 28)) // dwRate, dwScale
          }
        } else if (id == fourcc("idx1")) {
          require(len % 16 == 0, s"idx1 length $len not a multiple of 16")
          idxCount = len / 16
        } else if (inMovi && (id == fourcc("00dc") || id == fourcc("00db"))) {
          val payload = new Array[Byte](len)
          bb.position(pos + 8); bb.get(payload)
          frames += payload
        } // else: unknown chunk (JUNK, INFO, ...) — skip
        pos += 8 + len + (len & 1)
      }
    }
    walk(12, 8 + riffSize, inMovi = false)

    require(handlerOk, "no MJPG video stream header")
    require(width > 0 && height > 0, s"bad dims $width x $height")
    require(frames.nonEmpty, "no frames in movi list")
    require(totalFrames < 0 || totalFrames == frames.length,
      s"avih declares $totalFrames frames, movi carries ${frames.length}")
    require(idxCount < 0 || idxCount == frames.length,
      s"idx1 has $idxCount entries for ${frames.length} frames")
    MjpegAvi(width, height, usPerFrame, frames.toIndexedSeq,
      rate = rateScale._1, scale = rateScale._2)
  }
}
