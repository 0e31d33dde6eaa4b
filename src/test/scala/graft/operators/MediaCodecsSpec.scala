package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.{MediaCodecs, Multimodal}

/** The real media decoders ([[MediaCodecs]]): pinned to HAND-BUILT golden
  * bytes laid out from the public WAV/BMP specifications — not to our own
  * synthesizers — so the reader and writer cannot be wrong together. The
  * golden blobs include the wrinkles real files have: foreign chunks to
  * skip, odd-size chunk padding, stereo interleave, BMP row padding and
  * bottom-up row order. */
class MediaCodecsSpec extends SparkSpec {
  import spark.implicits._

  test("WAV decode walks chunks: stereo samples behind a LIST chunk") {
    // RIFF size = WAVE(4) + fmt(8+16) + LIST(8+4) + data(8+8) = 56
    val bb = ByteBuffer.allocate(8 + 56).order(ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    cc("RIFF"); bb.putInt(56); cc("WAVE")
    cc("fmt "); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(2) // stereo
    bb.putInt(44100)
    bb.putInt(44100 * 4)
    bb.putShort(4)
    bb.putShort(16)
    cc("LIST"); bb.putInt(4); cc("INFO") // foreign chunk: must be skipped
    cc("data"); bb.putInt(8)
    Seq(100, -200, 300, -400).foreach(v => bb.putShort(v.toShort))
    val s = MediaCodecs.decodeWav(bb.array())
    assert(s.sampleRate == 44100 && s.channels == 2 && s.bitsPerSample == 16)
    assert(s.nSamples == 4L)
    assert(s.mean == -50.0)
    assert(s.peak == 400)
  }

  test("WAV decode honors odd-chunk padding before data") {
    // an odd-sized (3-byte) foreign chunk is padded to 4; a decoder that
    // forgets the pad byte misreads everything after it
    val bb = ByteBuffer.allocate(8 + 4 + 24 + (8 + 3 + 1) + (8 + 4))
      .order(ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    cc("RIFF"); bb.putInt(4 + 24 + 12 + 12); cc("WAVE")
    cc("fmt "); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(16000)
    bb.putShort(2); bb.putShort(16)
    cc("junk"); bb.putInt(3); bb.put(Array[Byte](9, 9, 9)); bb.put(0.toByte)
    cc("data"); bb.putInt(4)
    bb.putShort(1000.toShort); bb.putShort((-3000).toShort)
    val s = MediaCodecs.decodeWav(bb.array())
    assert(s.nSamples == 2L && s.mean == -1000.0 && s.peak == 3000)
  }

  test("WAV decode refuses non-PCM and truncated blobs") {
    val good = MediaCodecs.synthWav(7L, 10)
    // flip the format tag (offset 20: fmt payload start) to 3 = float
    val bad = good.clone(); bad(20) = 3
    assert(intercept[IllegalArgumentException] {
      MediaCodecs.decodeWav(bad)
    }.getMessage.contains("PCM"))
    assert(intercept[IllegalArgumentException] {
      MediaCodecs.decodeWav(good.take(30))
    }.getMessage.contains("short"))
  }

  test("synthWav round-trips its closed form through the real decoder") {
    val n = 100
    val s = MediaCodecs.decodeWav(MediaCodecs.synthWav(42L, n))
    val samples = (0 until n).map(i => MediaCodecs.sampleValue(42L, i).toInt)
    assert(s.nSamples == n.toLong && s.channels == 1 && s.sampleRate == 8000)
    assert(s.mean == samples.map(_.toLong).sum.toDouble / n)
    assert(s.peak == samples.map(math.abs).max)
  }

  test("BMP decode: hand-built 3x2 bottom-up rows with padding") {
    // rowSize = ((3*3 + 3) / 4) * 4 = 12 (3 pad bytes per row)
    val bb = ByteBuffer.allocate(54 + 24).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + 24); bb.putInt(0); bb.putInt(54)
    bb.putInt(40); bb.putInt(3); bb.putInt(2)
    bb.putShort(1); bb.putShort(24); bb.putInt(0); bb.putInt(24)
    bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
    // file row 0 = image BOTTOM row: pixels (B,G,R); padding = 0xEE must
    // be excluded from the means
    val bottom = Array[Int](10, 20, 30, 40, 50, 60, 70, 80, 90)
    val top = Array[Int](1, 2, 3, 4, 5, 6, 7, 8, 9)
    bottom.foreach(v => bb.put(v.toByte))
    Seq(0xee, 0xee, 0xee).foreach(v => bb.put(v.toByte))
    top.foreach(v => bb.put(v.toByte))
    Seq(0xee, 0xee, 0xee).foreach(v => bb.put(v.toByte))
    val s = MediaCodecs.decodeBmp(bb.array())
    assert(s.width == 3 && s.height == 2)
    val bs = bottom.grouped(3).map(_(0)).sum + top.grouped(3).map(_(0)).sum
    val gs = bottom.grouped(3).map(_(1)).sum + top.grouped(3).map(_(1)).sum
    val rs = bottom.grouped(3).map(_(2)).sum + top.grouped(3).map(_(2)).sum
    assert(s.meanB == bs / 6.0 && s.meanG == gs / 6.0 && s.meanR == rs / 6.0)
  }

  test("BMP decode refuses 8-bit and compressed variants") {
    val good = MediaCodecs.synthBmp(5L, 4, 3)
    val bad8 = good.clone(); bad8(28) = 8 // bit depth lives at offset 28
    assert(intercept[IllegalArgumentException] {
      MediaCodecs.decodeBmp(bad8)
    }.getMessage.contains("depth"))
    val badRle = good.clone(); badRle(30) = 1 // BI_RLE8
    assert(intercept[IllegalArgumentException] {
      MediaCodecs.decodeBmp(badRle)
    }.getMessage.contains("compression"))
  }

  test("synthBmp round-trips its closed form through the real decoder") {
    val (w, h) = (5, 4) // width 5: rowSize 16, one pad byte
    val s = MediaCodecs.decodeBmp(MediaCodecs.synthBmp(11L, w, h))
    def mean(cx: Int, cy: Int): Double =
      (for { y <- 0 until h; x <- 0 until w }
        yield MediaCodecs.pixelChannel(11L, x, y, cx, cy)).sum.toDouble / (w * h)
    assert(s.meanR == mean(3, 7) && s.meanG == mean(5, 11) && s.meanB == mean(2, 13))
  }

  test("DataFrame faces decode distributed blobs (no driver materialization)") {
    val ids = (1L to 20L).toDF("doc_id").repartition(4)
    val wav = Multimodal.wavFeatures(Multimodal.wavMedia(ids, "doc_id"))
      .orderBy("id").collect()
    assert(wav.length == 20)
    wav.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(3) == 64 + id % 64, "n_samples follows the contract")
      assert(r.getInt(1) == 8000 && r.getInt(2) == 1)
    }
    val bmp = Multimodal.bmpFeatures(Multimodal.bmpMedia(ids, "doc_id"))
      .orderBy("id").collect()
    assert(bmp.length == 20)
    bmp.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (4 + id % 5).toInt && r.getInt(2) == (3 + id % 4).toInt)
    }
  }
}
