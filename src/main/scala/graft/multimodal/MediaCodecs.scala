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
          val tag = bb.getShort & 0xffff
          require(tag == 1, s"audio format $tag unsupported (PCM=1 only)")
          channels = bb.getShort & 0xffff
          sampleRate = bb.getInt
          bb.getInt // byte rate
          bb.getShort // block align
          bits = bb.getShort & 0xffff
          require(bits == 16, s"bits per sample $bits unsupported (16 only)")
          require(channels > 0, "zero channels")
          sawFmt = true
        case "data" =>
          require(sawFmt, "data chunk before fmt chunk")
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
}
