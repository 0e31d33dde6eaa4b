package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MediaCodecs

/** JPEG breadth guardrails (VERDICT r11 #8): the decoder accepts
  * baseline/extended-sequential Huffman (SOF0/SOF1) ONLY. Every other
  * frame type — progressive, lossless, differential, arithmetic-coded —
  * plus 12-bit precision and >2 sampling factors must refuse LOUDLY with
  * a message that NAMES the marker / parameter, mirroring the PNG/GIF
  * refusal specs. Fixtures are a valid synthetic baseline JPEG with the
  * relevant header byte patched, so each case isolates exactly one
  * refusal path. */
class JpegGuardrailSpec extends AnyFunSuite {

  private def baseline: Array[Byte] = MediaCodecs.synthJpeg(7, 2, 2)

  /** Offset of the SOF0 marker byte (the 0xc0 after 0xff). */
  private def sofMarkerPos(b: Array[Byte]): Int = {
    val i = b.indices.drop(2).find(i =>
      (b(i - 1) & 0xff) == 0xff && (b(i) & 0xff) == 0xc0).get
    i
  }

  private def patched(f: Array[Byte] => Unit): Array[Byte] = {
    val b = baseline.clone()
    f(b); b
  }

  // SOF payload layout after the marker byte: len(2) precision(1)
  // height(2) width(2) nComp(1) [id(1) hv(1) q(1)]*
  private def precisionPos(b: Array[Byte]) = sofMarkerPos(b) + 3
  private def firstHvPos(b: Array[Byte]) = sofMarkerPos(b) + 10

  /** (name, marker byte, fragments the refusal must contain) — the
    * refusal table the verdict asked for. */
  private val frameTypeCases = Seq(
    ("progressive", 0xc2, Seq("progressive DCT (SOF2)", "SOF0/SOF1")),
    ("lossless", 0xc3, Seq("lossless sequential (SOF3)")),
    ("differential sequential", 0xc5, Seq("differential Huffman frame (SOF5)")),
    ("differential progressive", 0xc6, Seq("differential Huffman frame (SOF6)")),
    ("differential lossless", 0xc7, Seq("differential Huffman frame (SOF7)")),
    ("arithmetic sequential", 0xc9, Seq("arithmetic-coded sequential (SOF9)")),
    ("arithmetic progressive", 0xca, Seq("arithmetic-coded progressive (SOF10)")),
    ("arithmetic lossless", 0xcb, Seq("arithmetic-coded lossless (SOF11)")),
    ("differential arithmetic seq", 0xcd, Seq("differential arithmetic frame (SOF13)")),
    ("differential arithmetic prog", 0xce, Seq("differential arithmetic frame (SOF14)")),
    ("differential arithmetic lossless", 0xcf, Seq("differential arithmetic frame (SOF15)")))

  test("the baseline fixture itself decodes (patches isolate one path)") {
    val s = MediaCodecs.decodeJpeg(baseline)
    assert(s.width == 16 && s.height == 16)
  }

  frameTypeCases.foreach { case (name, marker, fragments) =>
    test(s"refuses $name frames, naming SOF${marker - 0xc0}") {
      val bad = patched(b => b(sofMarkerPos(b)) = marker.toByte)
      val e = intercept[IllegalArgumentException](MediaCodecs.decodeJpeg(bad))
      fragments.foreach(f => assert(e.getMessage.contains(f),
        s"message must name the frame type: ${e.getMessage}"))
      assert(e.getMessage.contains("unsupported JPEG frame type"))
    }
  }

  test("refuses 12-bit precision, naming the found precision") {
    val bad = patched(b => b(precisionPos(b)) = 12.toByte)
    val e = intercept[IllegalArgumentException](MediaCodecs.decodeJpeg(bad))
    assert(e.getMessage.contains("12-bit"), e.getMessage)
    assert(e.getMessage.contains("8-bit baseline only"), e.getMessage)
  }

  test("refuses sampling factors above 2, naming the factors") {
    val bad = patched(b => b(firstHvPos(b)) = 0x33.toByte)
    val e = intercept[IllegalArgumentException](MediaCodecs.decodeJpeg(bad))
    assert(e.getMessage.contains("sampling 3x3 outside [1,2]"), e.getMessage)
  }

  test("reserved JPG marker (0xFFC8) refuses with the marker byte") {
    val bad = patched(b => b(sofMarkerPos(b)) = 0xc8.toByte)
    val e = intercept[IllegalArgumentException](MediaCodecs.decodeJpeg(bad))
    assert(e.getMessage.contains("unsupported JPEG marker 0xffc8") ||
      e.getMessage.toLowerCase.contains("unsupported jpeg marker 0xffc8"),
      e.getMessage)
  }

  test("DAC (arithmetic conditioning, 0xFFCC) refuses with the marker") {
    val bad = patched(b => b(sofMarkerPos(b)) = 0xcc.toByte)
    val e = intercept[IllegalArgumentException](MediaCodecs.decodeJpeg(bad))
    assert(e.getMessage.toLowerCase.contains("unsupported jpeg marker 0xffcc"),
      e.getMessage)
  }

  test("EOI before any scan refuses") {
    // truncate to SOI + EOI
    val bad = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)
    val e = intercept[IllegalArgumentException](MediaCodecs.decodeJpeg(bad))
    assert(e.getMessage.contains("EOI before any scan"))
  }

  test("non-JPEG bytes refuse on the missing SOI") {
    val e = intercept[IllegalArgumentException](
      MediaCodecs.decodeJpeg("not a jpeg at all".getBytes))
    assert(e.getMessage.contains("missing SOI"))
  }
}
