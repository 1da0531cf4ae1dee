package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM media byte codecs for the multimodal pipeline — no native
  * image libraries, just format arithmetic:
  *
  *  - PNG: full decode for 8-bit non-interlaced gray/RGB/gray+alpha/RGBA —
  *    chunk walk, zlib inflate of IDAT, all five scanline filters
  *    (None/Sub/Up/Average/Paeth) reversed — plus a minimal solid-color
  *    RGB8 encoder (real signature, IHDR/IDAT/IEND chunks, CRC32s) used by
  *    tests and the oracle-checked `mm_features` query.
  *  - JPEG: marker-segment walk to the first SOF frame header for
  *    width/height (entropy decode is out of scope without a codec).
  *  - GIF: logical-screen descriptor width/height.
  *
  * Dimension parsing reads the same bytes any real decoder reads
  * (reference keeps media as opaque payload columns; cf.
  * src/utils/aws.rs byte-range reads), so the Spark-side plumbing in
  * [[Multimodal]] exercises genuine decode logic end to end.
  */
object MediaCodec {

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

  // ------------------------------------------------------------- dimensions

  /** PNG IHDR width/height (None unless a valid PNG signature + IHDR). */
  def pngDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 && b.startsWith(PngSig) &&
        new String(b.slice(12, 16), "US-ASCII") == "IHDR")
      Some((be32(b, 16), be32(b, 20)))
    else None

  /** JPEG width/height from the first SOF0-SOF15 frame header (skipping
    * the non-frame markers C4/C8/CC). */
  def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8)
      return None
    var pos = 2
    while (pos + 3 < b.length) {
      if ((b(pos) & 0xFF) != 0xFF) return None // lost marker sync
      val marker = b(pos + 1) & 0xFF
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7) ||
          marker == 0x01 || marker == 0xFF) {
        pos += (if (marker == 0xFF) 1 else 2) // parameterless / fill byte
      } else if (marker == 0xD9 || marker == 0xDA) {
        return None // end of image / start of scan without a SOF
      } else {
        val len = be16(b, pos + 2)
        if (len < 2 || pos + 2 + len > b.length) return None
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (len < 7) return None
          // segment: len(2) precision(1) height(2) width(2) ...
          return Some((be16(b, pos + 7), be16(b, pos + 5)))
        }
        pos += 2 + len
      }
    }
    None
  }

  /** GIF logical-screen width/height (GIF87a / GIF89a). */
  def gifDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 10) return None
    val hdr = new String(b.slice(0, 6), "US-ASCII")
    if (hdr == "GIF87a" || hdr == "GIF89a")
      Some(((b(6) & 0xFF) | ((b(7) & 0xFF) << 8),
        (b(8) & 0xFF) | ((b(9) & 0xFF) << 8)))
    else None
  }

  // ------------------------------------------------------------- PNG decode

  /** Decoded image: dimensions, channel count, and per-channel pixel means
    * in [0, 255] — the "feature" a stat-level vision stage consumes. */
  case class Decoded(width: Int, height: Int, channels: Int,
                     channelMeans: Array[Double])

  /** Full PNG decode for 8-bit, non-interlaced gray (0), RGB (2),
    * gray+alpha (4) and RGBA (6): inflate the concatenated IDAT stream and
    * reverse the per-scanline filter, then reduce to channel means.
    * Returns None for any other PNG flavor (16-bit, palette, interlaced)
    * or malformed bytes — callers fall back to dimensions-only. */
  /** Full pixel decode: IHDR parse, IDAT inflate, scanline unfilter —
    * everything [[pngDecode]] does, stopping before the channel-mean
    * reduction. Returns (width, height, channels, row-major interleaved
    * 8-bit samples). The perceptual-hash path ([[Multimodal]]
    * aHash/dHash) needs the actual pixels, not their means. */
  def pngDecodePixels(b: Array[Byte])
      : Option[(Int, Int, Int, Array[Byte])] = {
    if (!b.startsWith(PngSig)) return None
    var pos = 8
    var w = 0; var h = 0; var bitDepth = 0; var colorType = -1
    var interlace = 0
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && pos + 8 <= b.length) {
      val len = be32(b, pos)
      if (len < 0 || pos + 12 + len > b.length) return None
      val ctype = new String(b.slice(pos + 4, pos + 8), "US-ASCII")
      ctype match {
        case "IHDR" =>
          if (len < 13) return None
          w = be32(b, pos + 8); h = be32(b, pos + 12)
          bitDepth = b(pos + 16) & 0xFF; colorType = b(pos + 17) & 0xFF
          interlace = b(pos + 20) & 0xFF
        case "IDAT" => idat.write(b, pos + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunk
      }
      pos += 12 + len
    }
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => return None
    }
    if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0) return None

    val stride = w * channels
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    if (off < raw.length) return None

    // reverse scanline filters in place into `img`
    val img = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val filter = raw(y * (1 + stride)) & 0xFF
      val rowIn = y * (1 + stride) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xFF
        val a = if (x >= channels) img(rowOut + x - channels) & 0xFF else 0
        val up = if (y > 0) img(rowOut - stride + x) & 0xFF else 0
        val c = if (y > 0 && x >= channels)
          img(rowOut - stride + x - channels) & 0xFF else 0
        val recon = filter match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + up
          case 3 => cur + (a + up) / 2
          case 4 => // Paeth predictor
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          case _ => return None
        }
        img(rowOut + x) = (recon & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, channels, img))
  }

  def pngDecode(b: Array[Byte]): Option[Decoded] =
    pngDecodePixels(b).map { case (w, h, channels, img) =>
      val sums = new Array[Double](channels)
      var i = 0
      while (i < img.length) {
        sums(i % channels) += (img(i) & 0xFF)
        i += 1
      }
      val nPix = (w.toLong * h).toDouble
      Decoded(w, h, channels, sums.map(_ / nPix))
    }

  // ------------------------------------------------------------- PNG encode

  private def chunk(out: java.io.ByteArrayOutputStream, ctype: String,
                    data: Array[Byte]): Unit = {
    def wbe32(v: Int): Unit = {
      out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
      out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
    }
    wbe32(data.length)
    val tb = ctype.getBytes("US-ASCII")
    out.write(tb, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(tb); crc.update(data)
    wbe32(crc.getValue.toInt)
  }

  /** Minimal real PNG: solid-color 8-bit RGB, non-interlaced, filter 0 —
    * valid signature, chunk CRCs, and zlib stream (any PNG reader opens
    * it). Used by specs and the `mm_features` oracle construction. */
  def pngEncodeSolid(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"invalid dims ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, 8)
    val ihdr = new Array[Byte](13)
    def put32(off: Int, v: Int): Unit = {
      ihdr(off) = ((v >>> 24) & 0xFF).toByte
      ihdr(off + 1) = ((v >>> 16) & 0xFF).toByte
      ihdr(off + 2) = ((v >>> 8) & 0xFF).toByte
      ihdr(off + 3) = (v & 0xFF).toByte
    }
    put32(0, w); put32(4, h)
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, color type 2 (RGB)
    chunk(out, "IHDR", ihdr)
    val stride = 1 + w * 3
    val rawData = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = y * stride + 1 + x * 3
        rawData(o) = (r & 0xFF).toByte
        rawData(o + 1) = (g & 0xFF).toByte
        rawData(o + 2) = (b & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val def_ = new Deflater()
    def_.setInput(rawData); def_.finish()
    val buf = new Array[Byte](rawData.length + 1024)
    val compLen = def_.deflate(buf)
    def_.end()
    chunk(out, "IDAT", buf.take(compLen))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Minimal real PNG from explicit pixels: 8-bit GRAYSCALE (color
    * type 0), non-interlaced, filter 0 — `pixels` is row-major, length
    * w*h. The perceptual-hash rig plants gradient images through this
    * so the mm_dedup oracle can predict every decoded sample. */
  def pngEncodeGray(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length == w * h,
      s"invalid gray image: ${w}x$h with ${pixels.length} samples")
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, 8)
    val ihdr = new Array[Byte](13)
    def put32(off: Int, v: Int): Unit = {
      ihdr(off) = ((v >>> 24) & 0xFF).toByte
      ihdr(off + 1) = ((v >>> 16) & 0xFF).toByte
      ihdr(off + 2) = ((v >>> 8) & 0xFF).toByte
      ihdr(off + 3) = (v & 0xFF).toByte
    }
    put32(0, w); put32(4, h)
    ihdr(8) = 8; ihdr(9) = 0 // bit depth 8, color type 0 (gray)
    chunk(out, "IHDR", ihdr)
    val stride = 1 + w
    val rawData = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      System.arraycopy(pixels, y * w, rawData, y * stride + 1, w)
      y += 1
    }
    val def_ = new Deflater()
    def_.setInput(rawData); def_.finish()
    val buf = new Array[Byte](rawData.length + 1024)
    val compLen = def_.deflate(buf)
    def_.end()
    chunk(out, "IDAT", buf.take(compLen))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // -------------------------------------------------------------------
  // Audio: RIFF/WAVE. PCM is the one audio container where "decode" IS
  // the sample read — the data chunk holds the raw waveform, no entropy
  // coding — so like PNG (and unlike JPEG) the full decode stays pure
  // JVM. Compressed audio (mp3/aac) would degrade to metadata the same
  // way JPEG pixels do.
  // -------------------------------------------------------------------

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** Decoded PCM audio: rate, channels, frame count (samples per
    * channel), and per-channel RMS amplitude normalized to [0, 1] — the
    * stat-level audio feature a filtering stage consumes (near-silent /
    * clipped clips are the audio analogue of blank/corrupt images). */
  case class WavDecoded(sampleRate: Int, channels: Int, nFrames: Int,
                        channelRms: Array[Double])

  /** RIFF/WAVE chunk walk: locate `fmt ` and `data` (chunks may appear
    * in any order, sizes pad to even per the RIFF spec). Returns
    * (audioFormat, channels, sampleRate, bitsPerSample, dataOff,
    * dataLen) or None for malformed bytes. */
  private def wavChunks(b: Array[Byte])
      : Option[(Int, Int, Int, Int, Int, Int)] = {
    if (b.length < 12 ||
        new String(b.slice(0, 4), "US-ASCII") != "RIFF" ||
        new String(b.slice(8, 12), "US-ASCII") != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (pos + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val ctype = new String(b.slice(pos, pos + 4), "US-ASCII")
      val size = le32(b, pos + 4)
      if (size < 0) return None
      val avail = math.min(size, b.length - pos - 8)
      ctype match {
        case "fmt " if avail >= 16 =>
          fmt = Some((le16(b, pos + 8), le16(b, pos + 10),
            le32(b, pos + 12), le16(b, pos + 22)))
        case "data" => data = Some((pos + 8, avail))
        case _ => () // ancillary chunk (LIST, fact, ...)
      }
      // a declared size running past the buffer means a truncated (or
      // hostile) file: the clamped chunk above is the last parseable one,
      // and advancing `pos` by the raw 32-bit size would wrap Int
      // arithmetic negative and crash the walk on the next le32
      if (size > avail) pos = b.length
      else pos += 8 + size + (size & 1)
    }
    for ((af, ch, rate, bits) <- fmt; (off, len) <- data)
      yield (af, ch, rate, bits, off, len)
  }

  /** Header-only parse: (sampleRate, channels, nFrames) for any PCM bit
    * depth — the audio analogue of [[jpegDims]]. */
  def wavMeta(b: Array[Byte]): Option[(Int, Int, Int)] =
    wavChunks(b).collect {
      case (1, ch, rate, bits, _, len)
          if ch > 0 && rate > 0 && bits % 8 == 0 && bits > 0 =>
        (rate, ch, len / (ch * bits / 8))
    }

  /** Full decode for PCM 16-bit (the dominant uncompressed flavor):
    * per-channel RMS over every sample. Other bit depths / compressed
    * formats return None — callers fall back to [[wavMeta]] or
    * dimensionless metadata, never fail the batch. */
  def wavDecode(b: Array[Byte]): Option[WavDecoded] =
    wavChunks(b).flatMap {
      case (1, ch, rate, 16, off, len)
          if ch > 0 && rate > 0 && len >= 2 * ch =>
        val nFrames = len / (2 * ch)
        val sumSq = new Array[Double](ch)
        var f = 0
        while (f < nFrames) {
          var c = 0
          while (c < ch) {
            val s = le16(b, off + (f * ch + c) * 2).toShort.toDouble
            sumSq(c) += s * s
            c += 1
          }
          f += 1
        }
        Some(WavDecoded(rate, ch, nFrames,
          sumSq.map(sq => math.sqrt(sq / nFrames) / 32768.0)))
      case _ => None
    }

  /** Full sample decode for PCM 16-bit: (sampleRate, channels,
    * interleaved samples) — everything [[wavDecode]] reads, stopping
    * before the RMS reduction. The perceptual audio-hash path
    * ([[Multimodal]] audioHashes) needs the actual waveform, not its
    * amplitude summary (cf. [[pngDecodePixels]] for images). */
  def wavDecodeSamples(b: Array[Byte])
      : Option[(Int, Int, Array[Short])] =
    wavChunks(b).flatMap {
      case (1, ch, rate, 16, off, len)
          if ch > 0 && rate > 0 && len >= 2 * ch =>
        val n = len / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = le16(b, off + i * 2).toShort; i += 1 }
        Some((rate, ch, out))
      case _ => None
    }

  /** Minimal real WAV: PCM 16-bit, interleaved samples — valid RIFF
    * header any audio reader opens. Used by specs and the `mm_audio`
    * oracle construction (cf. [[pngEncodeSolid]]). */
  def wavEncodePcm16(sampleRate: Int, channels: Int,
                     samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 &&
      samples.length % channels == 0,
      s"invalid wav shape rate=$sampleRate ch=$channels n=${samples.length}")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putStr(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, off)
    def put32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte
      out(off + 1) = ((v >>> 8) & 0xFF).toByte
      out(off + 2) = ((v >>> 16) & 0xFF).toByte
      out(off + 3) = ((v >>> 24) & 0xFF).toByte
    }
    def put16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte
      out(off + 1) = ((v >>> 8) & 0xFF).toByte
    }
    putStr(0, "RIFF"); put32(4, 36 + dataLen); putStr(8, "WAVE")
    putStr(12, "fmt "); put32(16, 16)
    put16(20, 1); put16(22, channels); put32(24, sampleRate)
    put32(28, sampleRate * channels * 2)   // byte rate
    put16(32, channels * 2); put16(34, 16) // block align, bits
    putStr(36, "data"); put32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      put16(44 + i * 2, samples(i) & 0xFFFF)
      i += 1
    }
    out
  }

  // -------------------------------------------------------------------
  // AVI (RIFF) video container, Motion-PNG flavor. Same rationale as
  // WAV: the container is pure structure — RIFF chunk walk, LIST
  // recursion, '00dc' frame chunks — so the walk is real format work,
  // and with PNG-coded frames (fourcc MPNG, a registered VfW handler)
  // the per-frame pixel decode reuses [[pngDecode]] and stays pure JVM.
  // Entropy-coded streams (MJPEG/H.264) would degrade to container
  // metadata exactly like JPEG stills degrade to [[jpegDims]].
  // -------------------------------------------------------------------

  /** Container-level video metadata from the `avih` main header:
    * dimensions, frame period in microseconds, and declared frame
    * count. */
  case class AviMeta(width: Int, height: Int, usecPerFrame: Int,
                     nFrames: Int)

  private def riffIsAvi(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      new String(b.slice(0, 4), "US-ASCII") == "RIFF" &&
      new String(b.slice(8, 12), "US-ASCII") == "AVI "

  /** Walk the chunks of a RIFF region `[pos, end)`, invoking `f` with
    * (fourcc, dataOff, dataLen) per chunk. LIST chunks are reported as
    * their list TYPE (e.g. "hdrl", "movi") with the region AFTER the
    * type word, so callers recurse naturally. Sizes pad to even per the
    * RIFF spec; a size running past the buffer clamps (truncated file —
    * parse what's there, like every tolerant AVI reader). */
  private def riffWalk(b: Array[Byte], pos0: Int, end: Int)
                      (f: (String, Int, Int) => Unit): Unit = {
    var pos = pos0
    while (pos + 8 <= end) {
      val cc = new String(b.slice(pos, pos + 4), "US-ASCII")
      val size = le32(b, pos + 4)
      if (size < 0) return
      val avail = math.min(size, end - pos - 8)
      if (cc == "LIST" && avail >= 4) {
        val listType = new String(b.slice(pos + 8, pos + 12), "US-ASCII")
        f(listType, pos + 12, avail - 4)
      } else f(cc, pos + 8, avail)
      // same truncation clamp as wavChunks: an oversized declared size
      // ends the walk (the clamped region was already reported) instead
      // of wrapping `pos` negative via Int overflow
      if (size > avail) return
      pos += 8 + size + (size & 1)
    }
  }

  /** Header-only parse — the video analogue of [[wavMeta]]: `avih`
    * fields from the `hdrl` list, or None for non-AVI bytes. */
  def aviMeta(b: Array[Byte]): Option[AviMeta] = {
    if (!riffIsAvi(b)) return None
    var meta: Option[AviMeta] = None
    riffWalk(b, 12, b.length) {
      case ("hdrl", off, len) =>
        riffWalk(b, off, off + len) {
          case ("avih", aOff, aLen) if aLen >= 40 && meta.isEmpty =>
            meta = Some(AviMeta(width = le32(b, aOff + 32),
              height = le32(b, aOff + 36),
              usecPerFrame = le32(b, aOff), nFrames = le32(b, aOff + 16)))
          case _ => ()
        }
      case _ => ()
    }
    meta.filter(m => m.width > 0 && m.height > 0 && m.usecPerFrame > 0)
  }

  /** Video frame payloads: every `##dc` (compressed video) chunk in the
    * `movi` list, in stream order. Payload bytes are whatever the
    * stream's codec wrote — MPNG frames are complete PNG files. */
  def aviFrames(b: Array[Byte]): Array[Array[Byte]] = {
    if (!riffIsAvi(b)) return Array.empty
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    riffWalk(b, 12, b.length) {
      case ("movi", off, len) =>
        riffWalk(b, off, off + len) {
          case (cc, fOff, fLen)
              if cc.length == 4 && cc.charAt(0).isDigit &&
                cc.charAt(1).isDigit && cc.endsWith("dc") =>
            frames += java.util.Arrays.copyOfRange(b, fOff, fOff + fLen)
          case _ => ()
        }
      case _ => ()
    }
    frames.toArray
  }

  /** Minimal real AVI: RIFF('AVI ') with an `hdrl` (avih + one `vids`
    * stream, handler MPNG) and a `movi` list of `00dc` frame chunks —
    * a valid container any AVI demuxer walks. Frames are opaque bytes
    * (PNG files for the MPNG flavor; cf. [[pngEncodeSolid]]). */
  def aviEncodeMpng(width: Int, height: Int, fps: Int,
                    frames: Array[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && 1000000 % fps == 0,
      s"invalid avi shape w=$width h=$height fps=$fps (fps must divide 1e6)")
    val out = new java.io.ByteArrayOutputStream()
    def put16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    def put32(v: Int): Unit = { put16(v & 0xFFFF); put16(v >>> 16) }
    def putCc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    // hdrl body: avih (56-byte main header) + strl(strh 56 + strf 40)
    putCc("avih"); put32(56)
    put32(1000000 / fps); put32(0); put32(0); put32(0)
    put32(frames.length); put32(0); put32(1); put32(maxFrame)
    put32(width); put32(height); (0 until 4).foreach(_ => put32(0))
    putCc("LIST"); put32(4 + 8 + 56 + 8 + 40); putCc("strl")
    putCc("strh"); put32(56)
    putCc("vids"); putCc("MPNG"); put32(0); put16(0); put16(0); put32(0)
    put32(1); put32(fps)                  // scale, rate: fps = rate/scale
    put32(0); put32(frames.length); put32(maxFrame); put32(0)
    put32(0)                              // sampleSize
    put16(0); put16(0); put16(width); put16(height)   // rcFrame
    putCc("strf"); put32(40)
    put32(40); put32(width); put32(height); put16(1); put16(24)
    putCc("MPNG"); put32(0); put32(0); put32(0); put32(0); put32(0)
    val hdrlBody = out.toByteArray
    // assemble: RIFF( 'AVI ' LIST(hdrl: avih+strl) LIST(movi: 00dc*) )
    val hdrlLen = 4 + hdrlBody.length
    val moviBody = new java.io.ByteArrayOutputStream()
    frames.foreach { fb =>
      moviBody.write("00dc".getBytes("US-ASCII"))
      val n = fb.length
      moviBody.write(n & 0xFF); moviBody.write((n >>> 8) & 0xFF)
      moviBody.write((n >>> 16) & 0xFF); moviBody.write((n >>> 24) & 0xFF)
      moviBody.write(fb)
      if ((n & 1) == 1) moviBody.write(0)   // RIFF even padding
    }
    val movi = moviBody.toByteArray
    val riffLen = 4 + (8 + hdrlLen) + (8 + 4 + movi.length)
    val full = new java.io.ByteArrayOutputStream()
    def p32(v: Int): Unit = { full.write(v & 0xFF); full.write((v >>> 8) & 0xFF)
      full.write((v >>> 16) & 0xFF); full.write((v >>> 24) & 0xFF) }
    full.write("RIFF".getBytes("US-ASCII")); p32(riffLen)
    full.write("AVI ".getBytes("US-ASCII"))
    full.write("LIST".getBytes("US-ASCII")); p32(hdrlLen)
    full.write("hdrl".getBytes("US-ASCII")); full.write(hdrlBody)
    full.write("LIST".getBytes("US-ASCII")); p32(4 + movi.length)
    full.write("movi".getBytes("US-ASCII")); full.write(movi)
    full.toByteArray
  }
}
