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
  /** Per-image decode ceiling (32M pixels ≈ 8K x 4K): a per-row JVM
    * decoder running on 32 executor threads must bound its worst-case
    * allocation from the HEADER, before any buffer grows. */
  val MaxDecodedPixels: Long = 1L << 25

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
}
