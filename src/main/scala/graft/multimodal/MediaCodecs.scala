package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL binary decoders for two self-describing media containers — RIFF
  * WAVE (PCM) and BMP (BITMAPINFOHEADER, uncompressed) — implemented from
  * their public specifications with no codec dependencies.
  *
  * These replace the text-byte fabrication that previously stood in for
  * "decode" in the multimodal pipeline: the parsers walk actual chunk /
  * header structure (chunk ids, little-endian sizes, format tags, row
  * padding) and fail loudly on malformed input, so the binary column is
  * load-bearing end-to-end. The container ships no media files, so test
  * blobs are SYNTHESIZED — but through the same public formats, and the
  * unit specs pin the decoders to hand-built golden bytes (including
  * foreign chunks and stereo/padding variants), not to our synthesizers.
  */
object MediaCodecs {

  // ------------------------------------------------------------- WAVE
  /** Decoded PCM facts + sample moments: `mean` = arithmetic mean over
    * every sample (all channels interleaved), `peak` = max |sample|. */
  final case class WavStats(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Long, mean: Double, peak: Int)

  /** Parse a RIFF/WAVE blob: verifies the RIFF‖WAVE envelope, walks the
    * chunk list (skipping unknown chunks, honoring the spec's even-byte
    * chunk padding), reads `fmt ` (must be format tag 1 = integer PCM,
    * 16-bit) and folds the `data` chunk's little-endian int16 samples. */
  def decodeWav(bytes: Array[Byte]): WavStats = {
    require(bytes.length >= 44, s"WAV too short: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); bb.get(b)
      new String(b, java.nio.charset.StandardCharsets.US_ASCII)
    }
    require(fourCC() == "RIFF", "not a RIFF container")
    bb.getInt // declared RIFF payload size (unreliable in the wild; walk chunks)
    require(fourCC() == "WAVE", "RIFF payload is not WAVE")

    var sampleRate = -1
    var channels = -1
    var bits = -1
    var tag = -1
    var nSamples = 0L
    var sum = 0L
    var peak = 0
    var sawFmt = false
    var sawData = false
    while (bb.remaining() >= 8) {
      val id = fourCC()
      val size = bb.getInt
      require(size >= 0 && size <= bb.remaining(),
        s"chunk '$id' declares $size bytes, ${bb.remaining()} remain")
      val next = bb.position() + size + (size & 1) // chunks pad to even
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short: $size")
          tag = bb.getShort & 0xffff
          require(tag == 1 || tag == 7,
            s"audio format $tag unsupported (PCM=1, G.711 mu-law=7)")
          channels = bb.getShort & 0xffff
          sampleRate = bb.getInt
          bb.getInt // byte rate
          bb.getShort // block align
          bits = bb.getShort & 0xffff
          if (tag == 1) require(bits == 16,
            s"bits per sample $bits unsupported for PCM (16 only)")
          else require(bits == 8,
            s"bits per sample $bits invalid for mu-law (8 by definition)")
          require(channels > 0, "zero channels")
          sawFmt = true
        case "data" =>
          require(sawFmt, "data chunk before fmt chunk")
          if (tag == 1) {
            require(size % 2 == 0, s"odd PCM-16 data size $size")
            var i = 0
            while (i < size) {
              val s = bb.getShort.toInt
              sum += s
              val a = math.abs(s)
              if (a > peak) peak = a
              nSamples += 1
              i += 2
            }
          } else { // G.711 mu-law: one byte per sample, expanded on read
            var i = 0
            while (i < size) {
              val s = muLawDecode(bb.get())
              sum += s
              val a = math.abs(s)
              if (a > peak) peak = a
              nSamples += 1
              i += 1
            }
          }
          sawData = true
        case _ => // LIST/INFO/fact/...: skip, that's the walk's point
      }
      bb.position(math.min(next, bb.limit()))
    }
    require(sawFmt && sawData, "missing fmt or data chunk")
    WavStats(sampleRate, channels, bits, nSamples,
      if (nSamples == 0) 0.0 else sum.toDouble / nSamples, peak)
  }

  /** Synthesize a spec-compliant mono PCM-16 WAVE blob whose samples are
    * the deterministic tone `sample(i) = ((seed·31 + i·7) mod 251 − 125)
    * · 200` — closed-form, so SQL oracles replay the decoded moments with
    * arithmetic alone. Any standards-conforming audio tool can play the
    * result. */
  def synthWav(seed: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    require(nSamples >= 0)
    val dataSize = nSamples * 2
    val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit =
      bb.put(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    cc("RIFF"); bb.putInt(36 + dataSize); cc("WAVE")
    cc("fmt "); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2) // block align
    bb.putShort(16) // bits
    cc("data"); bb.putInt(dataSize)
    var i = 0L
    while (i < nSamples) {
      bb.putShort(sampleValue(seed, i))
      i += 1
    }
    bb.array()
  }

  /** The synthesized tone, exposed so specs/oracles share one formula. */
  def sampleValue(seed: Long, i: Long): Short =
    ((((seed * 31 + i * 7) % 251) - 125) * 200).toShort

  /** G.711 mu-law expansion (the public CCITT formula at 16-bit scale):
    * complement the byte, split sign / 3-bit exponent / 4-bit mantissa,
    * reconstruct `((mantissa*8 + 0x84) << exponent) - 0x84`. Anchors
    * from the published tables: 0x00 -> -32124, 0x80 -> +32124,
    * 0xFF -> 0. */
  def muLawDecode(b: Byte): Int = {
    val u = (~b) & 0xff
    val exponent = (u >> 4) & 7
    val mantissa = u & 0x0f
    val mag = (((mantissa << 3) + 0x84) << exponent) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** Synthesize a mono G.711 mu-law WAVE blob (format tag 7, 8-bit
    * samples) whose BYTES are the closed form `(seed*13 + i*7) mod 256`
    * — the decoded moments then replay in SQL through [[muLawDecode]]'s
    * arithmetic (complement, shift, mask are all exact-integer). */
  def synthUlawWav(seed: Long, nSamples: Int,
                   sampleRate: Int = 8000): Array[Byte] = {
    require(nSamples >= 0)
    val bb = ByteBuffer.allocate(44 + nSamples).order(ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit =
      bb.put(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    cc("RIFF"); bb.putInt(36 + nSamples); cc("WAVE")
    cc("fmt "); bb.putInt(16)
    bb.putShort(7) // G.711 mu-law
    bb.putShort(1) // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate) // byte rate: 1 byte per sample
    bb.putShort(1) // block align
    bb.putShort(8) // bits
    cc("data"); bb.putInt(nSamples)
    var i = 0L
    while (i < nSamples) {
      bb.put((((seed * 13 + i * 7) % 256).toInt).toByte)
      i += 1
    }
    val arr = bb.array()
    // spec: odd-size data chunk pads to even at container level; the
    // buffer is exactly header+data, so a reader that honors padding
    // still stops at the data edge
    arr
  }

  // -------------------------------------------------------------- BMP
  /** Decoded bitmap facts + per-channel pixel means. */
  final case class BmpStats(
      width: Int, height: Int, meanR: Double, meanG: Double, meanB: Double)

  /** Parse an uncompressed 24-bit BMP: `BM` magic, pixel-array offset
    * from the file header, BITMAPINFOHEADER dimensions, bottom-up rows
    * padded to 4-byte boundaries, BGR byte order — all per the public
    * format. Means are over the true pixel rectangle (padding excluded). */
  def decodeBmp(bytes: Array[Byte]): BmpStats = {
    require(bytes.length >= 54, s"BMP too short: ${bytes.length}")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, "not a BMP")
    bb.getInt // file size
    bb.getInt // reserved
    val dataOffset = bb.getInt
    val dibSize = bb.getInt
    require(dibSize >= 40, s"DIB header $dibSize unsupported (BITMAPINFOHEADER+)")
    val width = bb.getInt
    val height = bb.getInt
    require(width > 0 && height > 0, s"unsupported dimensions $width x $height")
    bb.getShort // planes
    val bpp = bb.getShort & 0xffff
    require(bpp == 24, s"bit depth $bpp unsupported (24 only)")
    val compression = bb.getInt
    require(compression == 0, s"compression $compression unsupported (BI_RGB only)")
    val rowSize = ((width * 3 + 3) / 4) * 4
    require(dataOffset.toLong + rowSize.toLong * height <= bytes.length,
      "pixel array overruns the blob")
    var (sr, sg, sbl) = (0L, 0L, 0L)
    var y = 0
    while (y < height) {
      var base = dataOffset + y * rowSize // bottom-up: row y is image row height-1-y
      var x = 0
      while (x < width) {
        sbl += bytes(base) & 0xff
        sg += bytes(base + 1) & 0xff
        sr += bytes(base + 2) & 0xff
        base += 3
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    BmpStats(width, height, sr.toDouble / n, sg.toDouble / n, sbl.toDouble / n)
  }

  /** Synthesize a 24-bit BI_RGB BMP whose pixel (x, y) — y counted from
    * the TOP — has the closed-form channels `r = (seed + 3x + 7y) mod
    * 256`, `g = (seed + 5x + 11y) mod 256`, `b = (seed + 2x + 13y) mod
    * 256`, so oracles replay the means arithmetically. */
  def synthBmp(seed: Long, width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val bb = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + dataSize)
    bb.putInt(0)
    bb.putInt(54) // pixel-array offset
    bb.putInt(40) // BITMAPINFOHEADER
    bb.putInt(width)
    bb.putInt(height) // positive: bottom-up
    bb.putShort(1) // planes
    bb.putShort(24)
    bb.putInt(0) // BI_RGB
    bb.putInt(dataSize)
    bb.putInt(2835).putInt(2835) // 72 DPI
    bb.putInt(0).putInt(0) // palette
    var row = height - 1 // file rows run bottom-up; emit top row last
    while (row >= 0) {
      val base = 54 + (height - 1 - row) * rowSize
      bb.position(base)
      var x = 0
      while (x < width) {
        bb.put((pixelChannel(seed, x, row, 2, 13) & 0xff).toByte) // B
        bb.put((pixelChannel(seed, x, row, 5, 11) & 0xff).toByte) // G
        bb.put((pixelChannel(seed, x, row, 3, 7) & 0xff).toByte) // R
        x += 1
      }
      row -= 1
    }
    bb.array()
  }

  /** The synthesized channel formula, shared with specs/oracles. */
  def pixelChannel(seed: Long, x: Int, y: Int, cx: Int, cy: Int): Long =
    (seed + cx.toLong * x + cy.toLong * y) % 256

  // -------------------------------------------------------------- PNG
  /** Decoded PNG facts + per-channel pixel means. */
  final case class PngStats(
      width: Int, height: Int, meanR: Double, meanG: Double, meanB: Double)

  private val PngSignature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse an 8-bit truecolor (color type 2), non-interlaced PNG: the
    * 8-byte signature, the chunk walk (big-endian lengths, CRC32 over
    * type+data verified per chunk), IHDR validation, the concatenated
    * IDAT zlib stream inflated through the JDK's Inflater, and all five
    * scanline filters (None/Sub/Up/Average/Paeth) reconstructed per the
    * public specification. Fails loudly on malformed or unsupported
    * input (interlacing, palettes, other bit depths). */
  def decodePng(bytes: Array[Byte]): PngStats = {
    require(bytes.length >= 8 + 25 + 12, s"PNG too short: ${bytes.length}")
    var i = 0
    while (i < 8) {
      require(bytes(i) == PngSignature(i), "not a PNG (bad signature)")
      i += 1
    }
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    bb.position(8)
    var width = -1
    var height = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawIhdr = false
    var sawIend = false
    while (!sawIend && bb.remaining() >= 12) {
      val len = bb.getInt
      require(len >= 0 && len + 4 <= bb.remaining(),
        s"chunk declares $len bytes, ${bb.remaining()} remain")
      val typeAndData = new Array[Byte](4 + len)
      bb.get(typeAndData)
      val declaredCrc = bb.getInt
      val crc = new java.util.zip.CRC32()
      crc.update(typeAndData)
      require(crc.getValue.toInt == declaredCrc,
        s"CRC mismatch in '${new String(typeAndData, 0, 4, "US-ASCII")}' chunk")
      new String(typeAndData, 0, 4, java.nio.charset.StandardCharsets.US_ASCII) match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len")
          val hb = ByteBuffer.wrap(typeAndData, 4, 13).order(ByteOrder.BIG_ENDIAN)
          width = hb.getInt; height = hb.getInt
          require(width > 0 && height > 0, s"bad dimensions $width x $height")
          val bitDepth = hb.get() & 0xff
          val colorType = hb.get() & 0xff
          require(bitDepth == 8 && colorType == 2,
            s"unsupported bit depth/color type $bitDepth/$colorType " +
              "(8-bit truecolor only)")
          require((hb.get() & 0xff) == 0, "unsupported compression method")
          require((hb.get() & 0xff) == 0, "unsupported filter method")
          require((hb.get() & 0xff) == 0, "interlacing unsupported")
          sawIhdr = true
        case "IDAT" =>
          require(sawIhdr, "IDAT before IHDR")
          idat.write(typeAndData, 4, len)
        case "IEND" => sawIend = true
        case _ => // ancillary chunks (tEXt, pHYs, ...) skip
      }
    }
    require(sawIhdr && sawIend, "missing IHDR or IEND chunk")

    val rowBytes = 3 * width
    val raw = new Array[Byte]((1 + rowBytes) * height)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, off, raw.length - off)
      // zero progress while unfinished = truncated stream OR a shape we
      // don't speak (e.g. FDICT preset dictionary): fail loudly rather
      // than spin
      require(n > 0, "truncated or unsupported IDAT stream" +
        (if (inflater.needsDictionary) " (preset dictionary)" else ""))
      off += n
    }
    inflater.end()
    require(off == raw.length,
      s"inflated $off bytes, expected ${raw.length}")

    // per-row unfilter (bpp = 3); prev = reconstructed previous row
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    var (sr, sg, sbl) = (0L, 0L, 0L)
    val prev = new Array[Int](rowBytes)
    val cur = new Array[Int](rowBytes)
    var y = 0
    while (y < height) {
      val base = y * (1 + rowBytes)
      val filter = raw(base) & 0xff
      require(filter <= 4, s"unknown filter $filter in row $y")
      var x = 0
      while (x < rowBytes) {
        val f = raw(base + 1 + x) & 0xff
        val a = if (x >= 3) cur(x - 3) else 0
        val b = prev(x)
        val c = if (x >= 3) prev(x - 3) else 0
        cur(x) = (filter match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + (a + b) / 2
          case 4 => f + paeth(a, b, c)
        }) & 0xff
        x += 1
      }
      x = 0
      while (x < rowBytes) {
        sr += cur(x); sg += cur(x + 1); sbl += cur(x + 2)
        x += 3
      }
      System.arraycopy(cur, 0, prev, 0, rowBytes)
      y += 1
    }
    val n = width.toLong * height
    PngStats(width, height, sr.toDouble / n, sg.toDouble / n, sbl.toDouble / n)
  }

  /** Synthesize an 8-bit truecolor PNG with the SAME closed-form pixel
    * channels as [[synthBmp]] (so oracles share the arithmetic), cycling
    * the row filter through all five types (`y mod 5`) — every decoder
    * filter path is exercised by construction. Any standards-conforming
    * viewer renders the result. */
  def synthPng(seed: Long, width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowBytes = 3 * width
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    // raw scanlines with per-row filters applied (encode = raw - predictor)
    val filtered = new Array[Byte]((1 + rowBytes) * height)
    val prev = new Array[Int](rowBytes)
    val cur = new Array[Int](rowBytes)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        cur(3 * x) = (pixelChannel(seed, x, y, 3, 7) & 0xff).toInt // R
        cur(3 * x + 1) = (pixelChannel(seed, x, y, 5, 11) & 0xff).toInt // G
        cur(3 * x + 2) = (pixelChannel(seed, x, y, 2, 13) & 0xff).toInt // B
        x += 1
      }
      val filter = y % 5
      val base = y * (1 + rowBytes)
      filtered(base) = filter.toByte
      var i = 0
      while (i < rowBytes) {
        val a = if (i >= 3) cur(i - 3) else 0
        val b = prev(i)
        val c = if (i >= 3) prev(i - 3) else 0
        val pred = filter match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        filtered(base + 1 + i) = ((cur(i) - pred) & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, rowBytes)
      y += 1
    }
    // zlib-compress the filtered stream
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered)
    deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) {
      zOut.write(buf, 0, deflater.deflate(buf))
    }
    deflater.end()
    val z = zOut.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSignature, 0, 8)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      val lenB = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        .putInt(data.length).array()
      out.write(lenB, 0, 4)
      val td = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ data
      out.write(td, 0, td.length)
      val crc = new java.util.zip.CRC32()
      crc.update(td)
      out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        .putInt(crc.getValue.toInt).array(), 0, 4)
    }
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(2.toByte)  // truecolor
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", z)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // -------------------------------------------------------------- GIF
  /** Per-image decode ceiling (default 32M pixels ≈ 8K x 4K): a per-row
    * JVM decoder running on 32 executor threads must bound its
    * worst-case allocation from the HEADER, before any buffer grows.
    * This is a DoS guard against crafted headers (a 65535x65535 GIF
    * declares 16G pixels in 20 bytes), NOT a corruption signal — a
    * legitimate oversized image hits the same rejection. Deployments
    * whose corpora legitimately exceed 32M pixels raise it per-JVM with
    * -Dgraft.media.maxDecodedPixels=N (on a cluster:
    * spark.executor.extraJavaOptions, since decode runs executor-side).
    * Read ONCE at first decode — per-row decoders must not take the
    * synchronized sys.props lock on a 32-thread hot path; changing the
    * property after the first decode has no effect. */
  lazy val MaxDecodedPixels: Long =
    sys.props.get("graft.media.maxDecodedPixels")
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
      .filter(_ > 0)
      .getOrElse(1L << 25)

  final case class GifStats(
      width: Int, height: Int, meanR: Double, meanG: Double, meanB: Double)

  /** Parse a GIF87a/89a blob: logical screen descriptor, global/local
    * color tables, extension blocks (walked sub-block by sub-block),
    * the first image descriptor, and a FULL LZW decode of its data
    * stream — variable code width 3..12 bits packed LSB-first,
    * CLEAR/EOI handling, dictionary growth including the KwKwK
    * self-reference case. Means are over palette-resolved pixels and
    * the decoded pixel count must equal the descriptor's rectangle
    * (interlace only permutes row order, which means are invariant to,
    * so the flag is accepted). */
  def decodeGif(bytes: Array[Byte]): GifStats = {
    require(bytes.length >= 13, s"GIF too short: ${bytes.length}")
    val hdr = new String(bytes, 0, 6, "US-ASCII")
    require(hdr == "GIF87a" || hdr == "GIF89a", s"not a GIF: '$hdr'")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(6)
    bb.getShort(); bb.getShort() // logical screen (canvas) size
    val packed = bb.get() & 0xff
    bb.get() // background color index
    bb.get() // pixel aspect ratio
    def readColorTable(sizeBits: Int): Array[Int] = {
      val n = 1 << (sizeBits + 1)
      require(bb.remaining() >= 3 * n,
        s"color table truncated: $n entries declared, ${bb.remaining()} bytes left")
      val t = new Array[Int](n)
      var i = 0
      while (i < n) {
        t(i) = ((bb.get() & 0xff) << 16) | ((bb.get() & 0xff) << 8) |
          (bb.get() & 0xff)
        i += 1
      }
      t
    }
    def subBlockLen(): Int = {
      require(bb.remaining() >= 1, "GIF truncated inside a sub-block chain")
      val len = bb.get() & 0xff
      require(bb.remaining() >= len,
        s"GIF sub-block declares $len bytes, ${bb.remaining()} remain")
      len
    }
    val gct =
      if ((packed & 0x80) != 0) readColorTable(packed & 7)
      else Array.empty[Int]
    var palette = gct
    var width = -1
    var height = -1
    var minCode = -1
    var lzw: Array[Byte] = null
    while (lzw == null) {
      require(bb.remaining() >= 1, "unterminated GIF block stream")
      (bb.get() & 0xff) match {
        case 0x21 => // extension: label byte + terminated sub-blocks
          require(bb.remaining() >= 1, "GIF truncated inside an extension")
          bb.get()
          var len = subBlockLen()
          while (len != 0) {
            bb.position(bb.position() + len)
            len = subBlockLen()
          }
        case 0x2c => // image descriptor
          require(bb.remaining() >= 10, "GIF image descriptor truncated")
          bb.getShort(); bb.getShort() // left, top
          width = bb.getShort() & 0xffff
          height = bb.getShort() & 0xffff
          require(width > 0 && height > 0, s"empty image $width x $height")
          // bound BEFORE allocating: a crafted 65535x65535 descriptor
          // must reject cleanly, not grow a ~4.3B-entry buffer (and the
          // Int product width*height would overflow in the post-decode
          // check below — compare in Long)
          require(width.toLong * height <= MaxDecodedPixels,
            s"GIF dimensions $width x $height exceed the " +
              s"$MaxDecodedPixels-pixel decode cap")
          val ip = bb.get() & 0xff
          if ((ip & 0x80) != 0) palette = readColorTable(ip & 7)
          require(palette.nonEmpty, "image has no color table")
          minCode = bb.get() & 0xff
          require(minCode >= 2 && minCode <= 8,
            s"LZW minimum code size $minCode outside [2, 8]")
          val out = new java.io.ByteArrayOutputStream()
          var len = subBlockLen()
          while (len != 0) {
            val chunk = new Array[Byte](len)
            bb.get(chunk)
            out.write(chunk)
            len = subBlockLen()
          }
          lzw = out.toByteArray
        case 0x3b =>
          throw new IllegalArgumentException("GIF trailer before any image")
        case other =>
          throw new IllegalArgumentException(
            f"unknown GIF block type 0x$other%02x")
      }
    }
    val indices = lzwDecode(lzw, minCode, width.toLong * height)
    require(indices.length.toLong == width.toLong * height,
      s"LZW decoded ${indices.length} pixels, expected ${width.toLong * height}")
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < indices.length) {
      val idx = indices(i)
      require(idx < palette.length,
        s"pixel index $idx outside the ${palette.length}-color table")
      val c = palette(idx)
      sr += (c >> 16) & 0xff; sg += (c >> 8) & 0xff; sb += c & 0xff
      i += 1
    }
    val n = (width.toLong * height).toDouble
    GifStats(width, height, sr / n, sg / n, sb / n)
  }

  /** GIF-variant LZW decode: codes read LSB-first at a width that grows
    * when the dictionary fills its code space (cap 12 bits per the
    * spec), CLEAR resets, EOI ends, `code == dictSize` is the KwKwK
    * case. Stops once `maxPixels` indices are out (trailing pad bits
    * must not decode as garbage codes). */
  private def lzwDecode(data: Array[Byte], minCode: Int,
                        maxPixels: Long): Array[Int] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefixes = new Array[Int](4096)
    val suffixes = new Array[Int](4096)
    var dictSize = eoi + 1
    var width = minCode + 1
    var prev = -1
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    val totalBits = data.length.toLong * 8
    var bitPos = 0L
    def readCode(): Int = {
      var v = 0
      var i = 0
      while (i < width) {
        val p = bitPos + i
        v |= ((data((p >> 3).toInt) >> (p & 7).toInt) & 1) << i
        i += 1
      }
      bitPos += width
      v
    }
    def expand(code: Int): Array[Int] = {
      val buf = new scala.collection.mutable.ArrayBuffer[Int]()
      var c = code
      while (c >= eoi + 1) {
        buf += suffixes(c)
        c = prefixes(c)
      }
      require(c < clear, s"corrupt LZW chain reaches reserved code $c")
      buf += c
      buf.reverse.toArray
    }
    var ended = false
    while (!ended && out.length < maxPixels && bitPos + width <= totalBits) {
      val code = readCode()
      if (code == clear) {
        dictSize = eoi + 1
        width = minCode + 1
        prev = -1
      } else if (code == eoi) {
        ended = true
      } else {
        require(code <= dictSize,
          s"LZW code $code beyond dictionary size $dictSize")
        val seq =
          if (code < dictSize) expand(code)
          else { // KwKwK: the code being defined by this very step
            require(prev >= 0, "KwKwK code with no previous code")
            val p = expand(prev)
            p :+ p(0)
          }
        out ++= seq
        if (prev >= 0 && dictSize < 4096) {
          prefixes(dictSize) = prev
          suffixes(dictSize) = seq(0)
          dictSize += 1
          if (dictSize == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    out.toArray
  }

  /** Synthesize a GIF89a whose 256-entry palette and pixel indices are
    * closed forms of `(seed, i, x, y)` — so a SQL oracle can replay the
    * decoded channel means exactly. The LZW stream interleaves a CLEAR
    * before every literal (constant 9-bit codes): valid, unambitious
    * compression any conformant decoder must accept — and deliberately
    * NOT the compression shape the decoder spec's golden bytes use, so
    * reader and writer cannot share a misreading. */
  def synthGif(seed: Long, width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(width); u16(height)
    out.write(0x80 | 7) // global color table, 2^8 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) {
      out.write(((seed + 5L * i) % 256).toInt)
      out.write(((seed * 3L + 11L * i) % 256).toInt)
      out.write(((seed * 7L + 13L * i) % 256).toInt)
      i += 1
    }
    out.write(0x2c)
    u16(0); u16(0); u16(width); u16(height)
    out.write(0) // no local table, not interlaced
    out.write(8) // LZW minimum code size
    val codes = new scala.collection.mutable.ArrayBuffer[Int]()
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        codes += 256 // CLEAR keeps every literal at 9 bits
        codes += ((seed + 3L * x + 7L * y) % 256).toInt
        x += 1
      }
      y += 1
    }
    codes += 257 // EOI
    val bits = new java.io.ByteArrayOutputStream()
    var cur = 0
    var nbits = 0
    codes.foreach { c =>
      cur |= c << nbits
      nbits += 9
      while (nbits >= 8) {
        bits.write(cur & 0xff)
        cur >>= 8
        nbits -= 8
      }
    }
    if (nbits > 0) bits.write(cur & 0xff)
    val payload = bits.toByteArray
    var off = 0
    while (off < payload.length) {
      val n = math.min(255, payload.length - off)
      out.write(n)
      out.write(payload, off, n)
      off += n
    }
    out.write(0) // data terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ------------------------------------------------------------- JPEG
  final case class JpegStats(
      width: Int, height: Int, meanR: Double, meanG: Double, meanB: Double)

  /** Zigzag scan order: natural (row-major) coefficient index for each
    * zigzag position (ITU-T T.81 figure 5). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** The standard Huffman tables of ITU-T T.81 Annex K.3 — the tables
    * virtually every baseline encoder emits, so the decoder's canonical
    * code construction is exercised against real-world shapes. Each is
    * (BITS: count of codes per length 1..16, HUFFVAL: symbols in code
    * order). */
  private val StdDcLum: (Array[Int], Array[Int]) = (
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    (0 to 11).toArray)
  private val StdDcChr: (Array[Int], Array[Int]) = (
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    (0 to 11).toArray)
  private val StdAcLum: (Array[Int], Array[Int]) = (
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d),
    Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
      0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
      0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
      0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
      0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
      0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
      0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
      0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
      0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
      0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
      0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
      0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
      0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
      0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
      0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))
  private val StdAcChr: (Array[Int], Array[Int]) = (
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    Array(
      0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
      0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
      0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
      0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
      0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
      0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
      0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
      0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
      0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
      0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
      0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
      0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
      0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
      0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
      0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))

  /** Canonical Huffman decoder state per T.81 F.2.2.3: for each code
    * length, the smallest/largest code and the HUFFVAL offset of the
    * first symbol of that length. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
      require(k == vals.length,
        s"Huffman table declares $k codes but carries ${vals.length} symbols")
    }
    /** (code, length) pairs per symbol, for the ENCODER side. */
    lazy val encode: Map[Int, (Int, Int)] = {
      var code = 0
      var k = 0
      val m = Map.newBuilder[Int, (Int, Int)]
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          m += vals(k) -> (code, l)
          code += 1; k += 1; i += 1
        }
        code <<= 1
        l += 1
      }
      m.result()
    }
  }

  /** Entropy-segment bit reader: MSB-first, 0xFF00 byte-stuffing
    * unstuffed, restart markers (FFD0-D7) consumed only via
    * [[restart]] at MCU-interval boundaries. */
  private final class JpegBitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    private def nextByte(): Int = {
      require(pos < data.length, "entropy stream truncated")
      val b = data(pos) & 0xff
      pos += 1
      if (b == 0xff) {
        require(pos < data.length, "entropy stream ends in 0xFF")
        val m = data(pos) & 0xff
        if (m == 0x00) pos += 1 // stuffed literal 0xFF
        else throw new IllegalArgumentException(
          f"marker 0xFF$m%02x inside entropy data (expected at a restart boundary)")
      }
      b
    }
    def bit(): Int = {
      if (nbits == 0) { acc = nextByte(); nbits = 8 }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (l <= 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
        code = (code << 1) | bit()
        l += 1
      }
      require(l <= 16, "invalid Huffman code (no 16-bit match)")
      t.values(t.valPtr(l) + code - t.minCode(l))
    }
    /** Byte-align and consume the expected RSTn marker. */
    def restart(expected: Int): Unit = {
      nbits = 0
      require(pos + 1 < data.length, "truncated at restart marker")
      require((data(pos) & 0xff) == 0xff &&
        (data(pos + 1) & 0xff) == (0xd0 + expected),
        f"expected RST$expected%d, found 0x${data(pos) & 0xff}%02x${data(pos + 1) & 0xff}%02x")
      pos += 2
    }
  }

  /** T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value. */
  @inline private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Fixed-point YCbCr→RGB, the libjpeg jdcolor constants (FIX(1.40200)
    * = 91881 etc., scale 2^16, >>16 is floor): integer-exact, so the
    * DuckDB oracle can reproduce the conversion bit-for-bit with
    * FLOOR(x / 65536). */
  @inline private def ycc2r(y: Int, cr: Int): Int =
    clamp255(y + ((91881 * (cr - 128) + 32768) >> 16))
  @inline private def ycc2g(y: Int, cb: Int, cr: Int): Int =
    clamp255(y - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16))
  @inline private def ycc2b(y: Int, cb: Int): Int =
    clamp255(y + ((116130 * (cb - 128) + 32768) >> 16))
  @inline private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** Decode a BASELINE SEQUENTIAL JPEG (SOI, DQT, SOF0, DHT, optional
    * DRI/APPn/COM, SOS, entropy-coded scan, EOI): canonical Huffman
    * decode, DC prediction, AC run-length with ZRL/EOB, dequantization
    * through the zigzag map, a separable double-precision IDCT (with a
    * DC-only fast path — exact for flat blocks by construction),
    * replication upsampling for sampling factors over [1, 2], and the
    * libjpeg fixed-point YCbCr→RGB. Grayscale (1 component) and YCbCr
    * (3 components) frames; restart intervals honored. Dimension cap
    * enforced from SOF0 BEFORE any plane allocation (same DoS guard as
    * [[decodeGif]]). */
  def decodeJpeg(bytes: Array[Byte]): JpegStats = {
    require(bytes.length >= 4, s"JPEG too short: ${bytes.length}")
    require((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG: missing SOI")
    var pos = 2
    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff); pos += 2; v }

    val quant = new Array[Array[Int]](4) // zigzag order, as transmitted
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var restartInterval = 0
    var width = 0
    var height = 0
    // per component: id, hSamp, vSamp, quant id, dc table, ac table
    var compIds: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var compDc: Array[Int] = null
    var compAc: Array[Int] = null
    var nComp = 0
    var sosSeen = false

    while (!sosSeen) {
      require(pos + 1 < bytes.length, "JPEG truncated before SOS")
      require(u8() == 0xff, "expected marker")
      var marker = u8()
      while (marker == 0xff) marker = u8() // fill bytes are legal
      marker match {
        case 0xdb => // DQT
          val end = pos + u16() - 2
          while (pos < end) {
            val pq = u8()
            val prec = pq >> 4
            val id = pq & 15
            require(prec <= 1, s"bad DQT precision $prec")
            require(id < 4, s"bad DQT id $id")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(i) = if (prec == 1) u16() else u8(); i += 1 }
            quant(id) = t
          }
        case 0xc0 | 0xc1 => // SOF0 baseline (SOF1 extended sequential, same layout)
          u16()
          val precision = u8()
          require(precision == 8,
            s"unsupported JPEG sample precision $precision-bit — " +
              "this decoder handles 8-bit baseline only")
          height = u16(); width = u16()
          require(width > 0 && height > 0, s"empty frame $width x $height")
          require(width.toLong * height <= MaxDecodedPixels,
            s"JPEG dimensions $width x $height exceed the " +
              s"$MaxDecodedPixels-pixel decode cap")
          nComp = u8()
          require(nComp == 1 || nComp == 3,
            s"unsupported component count $nComp")
          compIds = new Array[Int](nComp); compH = new Array[Int](nComp)
          compV = new Array[Int](nComp); compQ = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            compIds(c) = u8()
            val hv = u8()
            compH(c) = hv >> 4; compV(c) = hv & 15
            require(compH(c) >= 1 && compH(c) <= 2 &&
              compV(c) >= 1 && compV(c) <= 2,
              s"sampling ${compH(c)}x${compV(c)} outside [1,2]")
            compQ(c) = u8()
            c += 1
          }
        case 0xc4 => // DHT
          val end = pos + u16() - 2
          while (pos < end) {
            val tc = u8()
            val cls = tc >> 4
            val id = tc & 15
            require(cls <= 1 && id < 4, s"bad DHT class/id $cls/$id")
            val bits = Array.fill(16)(u8())
            val vals = Array.fill(bits.sum)(u8())
            val t = new HuffTable(bits, vals)
            if (cls == 0) dcTables(id) = t else acTables(id) = t
          }
        case 0xdd => // DRI
          u16(); restartInterval = u16()
        case 0xda => // SOS
          u16()
          val ns = u8()
          require(ns == nComp, s"scan components $ns != frame $nComp")
          compDc = new Array[Int](nComp); compAc = new Array[Int](nComp)
          var c = 0
          while (c < ns) {
            val id = u8()
            val idx = compIds.indexOf(id)
            require(idx >= 0, s"scan names unknown component $id")
            val tt = u8()
            compDc(idx) = tt >> 4; compAc(idx) = tt & 15
            c += 1
          }
          u8(); u8(); u8() // Ss, Se, Ah/Al — fixed in baseline
          sosSeen = true
        case 0xd9 =>
          throw new IllegalArgumentException("EOI before any scan")
        case m if m >= 0xe0 && m <= 0xef => pos += u16() - 2 // APPn
        case 0xfe => pos += u16() - 2 // COM
        case sof if sof >= 0xc2 && sof <= 0xcf && sof != 0xc4 &&
            sof != 0xc8 && sof != 0xcc =>
          // every non-baseline frame type gets a refusal that NAMES the
          // marker and the coding mode, so a 100 TB pipeline's error
          // rollup says WHAT the corpus contains, not just "bad byte"
          val kind = sof match {
            case 0xc2 => "progressive DCT (SOF2)"
            case 0xc3 => "lossless sequential (SOF3)"
            case 0xc5 | 0xc6 | 0xc7 =>
              s"differential Huffman frame (SOF${sof - 0xc0})"
            case 0xc9 => "arithmetic-coded sequential (SOF9)"
            case 0xca => "arithmetic-coded progressive (SOF10)"
            case 0xcb => "arithmetic-coded lossless (SOF11)"
            case _ => s"differential arithmetic frame (SOF${sof - 0xc0})"
          }
          throw new IllegalArgumentException(
            s"unsupported JPEG frame type: $kind — this decoder handles " +
              "baseline/extended-sequential Huffman (SOF0/SOF1) only")
        case other =>
          throw new IllegalArgumentException(
            f"unsupported JPEG marker 0xFF$other%02x")
      }
    }
    require(width > 0, "SOS before SOF0")

    val hMax = compH.max
    val vMax = compV.max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // per-component planes at component resolution, padded to whole MCUs
    val planeW = Array.tabulate(nComp)(c => mcusX * compH(c) * 8)
    val planeH = Array.tabulate(nComp)(c => mcusY * compV(c) * 8)
    val planes = Array.tabulate(nComp)(c => new Array[Byte](planeW(c) * planeH(c)))

    val reader = new JpegBitReader(bytes, pos)
    val dcPred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val idctOut = new Array[Int](64)

    def decodeBlock(c: Int): Unit = {
      java.util.Arrays.fill(coef, 0)
      val qt = quant(compQ(c))
      require(qt != null, s"component $c references missing quant table")
      val dcT = dcTables(compDc(c))
      val acT = acTables(compAc(c))
      require(dcT != null && acT != null,
        s"component $c references missing Huffman table")
      val s0 = reader.decode(dcT)
      require(s0 <= 11, s"DC category $s0 > 11")
      dcPred(c) += extend(reader.bits(s0), s0)
      coef(0) = dcPred(c) * qt(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = reader.decode(acT)
        val r = rs >> 4
        val s = rs & 15
        if (s == 0) {
          if (r == 15) k += 16 // ZRL: sixteen zeros
          else eob = true
        } else {
          k += r
          require(k < 64, s"AC run overflows block at $k")
          coef(Zigzag(k)) = extend(reader.bits(s), s) * qt(k)
          k += 1
        }
      }
      idct8x8(coef, idctOut)
    }

    // separable 2D IDCT in doubles; DC-only fast path (flat block) stays
    // integer-exact, which the synthetic encoder's constant blocks rely on
    def idct8x8(in: Array[Int], out: Array[Int]): Unit = {
      var allAcZero = true
      var i = 1
      while (i < 64 && allAcZero) { if (in(i) != 0) allAcZero = false; i += 1 }
      if (allAcZero) {
        val v = clamp255(Math.round(in(0) / 8.0).toInt + 128)
        java.util.Arrays.fill(out, v)
        return
      }
      val tmp = new Array[Double](64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var sum = 0.0
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              val cu = if (u == 0) 0.7071067811865476 else 1.0
              val cv = if (v == 0) 0.7071067811865476 else 1.0
              sum += cu * cv * in(v * 8 + u) *
                IdctCos(x)(u) * IdctCos(y)(v)
              v += 1
            }
            u += 1
          }
          tmp(y * 8 + x) = sum / 4.0
          x += 1
        }
        y += 1
      }
      var j = 0
      while (j < 64) {
        out(j) = clamp255(Math.round(tmp(j)).toInt + 128)
        j += 1
      }
    }

    val mcuTotal = mcusX * mcusY
    var mcu = 0
    var rst = 0
    while (mcu < mcuTotal) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        reader.restart(rst)
        rst = (rst + 1) & 7
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var c = 0
      while (c < nComp) {
        var by = 0
        while (by < compV(c)) {
          var bx = 0
          while (bx < compH(c)) {
            decodeBlock(c)
            val ox = (mx * compH(c) + bx) * 8
            val oy = (my * compV(c) + by) * 8
            var py = 0
            while (py < 8) {
              var px = 0
              val rowBase = (oy + py) * planeW(c) + ox
              while (px < 8) {
                planes(c)(rowBase + px) = idctOut(py * 8 + px).toByte
                px += 1
              }
              py += 1
            }
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }

    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (nComp == 1) {
          val v = planes(0)((y * compV(0) / vMax) * planeW(0) +
            x * compH(0) / hMax) & 0xff
          sr += v; sg += v; sb += v
        } else {
          val yy = planes(0)((y * compV(0) / vMax) * planeW(0) +
            x * compH(0) / hMax) & 0xff
          val cb = planes(1)((y * compV(1) / vMax) * planeW(1) +
            x * compH(1) / hMax) & 0xff
          val cr = planes(2)((y * compV(2) / vMax) * planeW(2) +
            x * compH(2) / hMax) & 0xff
          sr += ycc2r(yy, cr); sg += ycc2g(yy, cb, cr); sb += ycc2b(yy, cb)
        }
        x += 1
      }
      y += 1
    }
    val n = (width.toLong * height).toDouble
    JpegStats(width, height, sr / n, sg / n, sb / n)
  }

  /** MSB-first bit writer with JPEG 0xFF00 byte stuffing; [[pad]] fills
    * the final partial byte with 1-bits per T.81 F.1.2.3. */
  private final class JpegBitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def pad(): Unit = if (nbits > 0) write((1 << (8 - nbits)) - 1, 8 - nbits)
  }

  private val nComponents = 3

  /** Shared emit machinery for the synthetic baseline-JPEG encoders:
    * headers (DQT all-8s, SOF0 with the caller's luma sampling, the four
    * Annex K.3 DHT segments, optional DRI, SOS) and the DC-only block
    * encoder with per-component prediction, restart handling and the
    * final pad+EOI. One body — the 4:4:4 and 4:2:0 faces differ only in
    * sampling bytes and MCU walk. */
  private final class JpegSynth(restartInterval: Int = 0) {
    private val out = new java.io.ByteArrayOutputStream()
    private def u8(v: Int): Unit = out.write(v & 0xff)
    private def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    private def marker(m: Int): Unit = { u8(0xff); u8(m) }

    def headers(width: Int, height: Int, ySampling: Int): Unit = {
      marker(0xd8) // SOI
      marker(0xdb) // DQT, table 0, all 8s
      u16(2 + 1 + 64); u8(0)
      (0 until 64).foreach(_ => u8(8))
      marker(0xc0) // SOF0
      u16(8 + 3 * nComponents)
      u8(8) // precision
      u16(height); u16(width)
      u8(nComponents)
      u8(1); u8(ySampling); u8(0) // Y
      u8(2); u8(0x11); u8(0) // Cb: 1x1
      u8(3); u8(0x11); u8(0) // Cr
      def dht(cls: Int, id: Int, t: (Array[Int], Array[Int])): Unit = {
        marker(0xc4)
        u16(2 + 1 + 16 + t._2.length)
        u8((cls << 4) | id)
        t._1.foreach(u8)
        t._2.foreach(u8)
      }
      dht(0, 0, StdDcLum); dht(1, 0, StdAcLum)
      dht(0, 1, StdDcChr); dht(1, 1, StdAcChr)
      if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
      marker(0xda) // SOS
      u16(6 + 2 * nComponents)
      u8(nComponents)
      u8(1); u8(0x00) // Y: DC 0, AC 0
      u8(2); u8(0x11) // Cb: DC 1, AC 1
      u8(3); u8(0x11)
      u8(0); u8(63); u8(0) // Ss, Se, AhAl
    }

    private val dcLum = new HuffTable(StdDcLum._1, StdDcLum._2).encode
    private val dcChr = new HuffTable(StdDcChr._1, StdDcChr._2).encode
    private val acLumEob = new HuffTable(StdAcLum._1, StdAcLum._2).encode(0x00)
    private val acChrEob = new HuffTable(StdAcChr._1, StdAcChr._2).encode(0x00)
    private val w = new JpegBitWriter(out)
    private val pred = new Array[Int](3)
    private var mcu = 0
    private var rst = 0

    /** Call once per MCU BEFORE its blocks: emits the byte-aligned RSTn
      * at the configured interval and resets DC prediction. */
    def mcuBoundary(): Unit = {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        w.pad()
        marker(0xd0 + rst)
        rst = (rst + 1) & 7
        java.util.Arrays.fill(pred, 0)
      }
      mcu += 1
    }

    def emitBlock(comp: Int, value: Int): Unit = {
      val dc = value - 128
      val diff = dc - pred(comp)
      pred(comp) = dc
      val mag = math.abs(diff)
      val cat = 32 - Integer.numberOfLeadingZeros(mag) // 0 for diff == 0
      val (code, len) = (if (comp == 0) dcLum else dcChr)(cat)
      w.write(code, len)
      if (cat > 0) w.write(if (diff < 0) diff - 1 else diff, cat)
      val (ec, el) = if (comp == 0) acLumEob else acChrEob
      w.write(ec, el)
    }

    def finish(): Array[Byte] = {
      w.pad()
      marker(0xd9) // EOI
      out.toByteArray
    }
  }

  /** Encode a real baseline JPEG whose decode is EXACT: every 8x8 block
    * carries a constant YCbCr triple in closed form over (seed, block
    * coordinates), the quantization tables are all-8s, and blocks are
    * DC-only — so quantized DC = value - 128 exactly, the IDCT
    * reproduces the flat block bit-for-bit, and the DuckDB oracle can
    * mirror the decoded RGB via the same fixed-point color formula.
    * Emits DQT, SOF0 (3 components, 4:4:4), the four Annex K.3 standard
    * Huffman tables, optional DRI + restart markers, SOS, scan, EOI.
    *
    * Closed forms per block (bx, by), all mod 256:
    * Y = seed + 3 bx + 7 by; Cb = 3 seed + 5 bx + 11 by;
    * Cr = 7 seed + 13 bx + 17 by.
    */
  def synthJpeg(seed: Long, blocksW: Int, blocksH: Int,
                restartInterval: Int = 0): Array[Byte] = {
    require(blocksW > 0 && blocksH > 0)
    val s = java.lang.Math.floorMod(seed, 256L)
    val enc = new JpegSynth(restartInterval)
    enc.headers(blocksW * 8, blocksH * 8, ySampling = 0x11)
    var by = 0
    while (by < blocksH) {
      var bx = 0
      while (bx < blocksW) {
        enc.mcuBoundary()
        enc.emitBlock(0, ((s + 3L * bx + 7L * by) % 256).toInt)
        enc.emitBlock(1, ((s * 3L + 5L * bx + 11L * by) % 256).toInt)
        enc.emitBlock(2, ((s * 7L + 13L * bx + 17L * by) % 256).toInt)
        bx += 1
      }
      by += 1
    }
    enc.finish()
  }

  /** 4:2:0 variant of [[synthJpeg]]: Y sampled 2x2, Cb/Cr 1x1 — each MCU
    * covers 16x16 pixels with four luma blocks and one block per chroma.
    * Luma is constant per 8x8 block at GLOBAL block coordinates
    * (bx = 2 mx + sx), chroma constant per MCU — so replication
    * upsampling reconstructs the chroma EXACTLY and the decode stays
    * bit-predictable. Closed forms: Y = seed + 3 bx + 7 by;
    * Cb = 3 seed + 5 mx + 11 my; Cr = 7 seed + 13 mx + 17 my (mod 256). */
  def synthJpeg420(seed: Long, mcusW: Int, mcusH: Int): Array[Byte] = {
    require(mcusW > 0 && mcusH > 0)
    val s = java.lang.Math.floorMod(seed, 256L)
    val enc = new JpegSynth()
    enc.headers(mcusW * 16, mcusH * 16, ySampling = 0x22)
    var my = 0
    while (my < mcusH) {
      var mx = 0
      while (mx < mcusW) {
        enc.mcuBoundary()
        // four luma blocks in the decoder's (by, bx) raster order
        var sy = 0
        while (sy < 2) {
          var sx = 0
          while (sx < 2) {
            enc.emitBlock(0,
              ((s + 3L * (2 * mx + sx) + 7L * (2 * my + sy)) % 256).toInt)
            sx += 1
          }
          sy += 1
        }
        enc.emitBlock(1, ((s * 3L + 5L * mx + 11L * my) % 256).toInt)
        enc.emitBlock(2, ((s * 7L + 13L * mx + 17L * my) % 256).toInt)
        mx += 1
      }
      my += 1
    }
    enc.finish()
  }

  /** cos((2x + 1) u pi / 16) lookup for the reference IDCT. */
  private val IdctCos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
}
