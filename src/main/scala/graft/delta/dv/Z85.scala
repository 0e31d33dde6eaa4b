package graft.delta.dv

/** Z85 (ZeroMQ base-85, RFC draft `32/Z85`) — the text encoding Delta's
  * deletion-vector descriptors use for inline bitmaps and for the UUID
  * embedded in on-disk DV file names (PROTOCOL.md "Deletion Vector
  * Descriptor Schema": `pathOrInlineDv`).
  *
  * Z85 proper is defined only for inputs whose length is a multiple of 4;
  * Delta pads the tail with ZERO bytes on encode and truncates on decode
  * (the descriptor's `sizeInBytes` carries the true length), so the codec
  * here takes/returns explicit lengths.
  */
object Z85 {
  private val Alphabet: Array[Char] =
    ("0123456789abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#").toCharArray
  require(Alphabet.length == 85)

  private val Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** Encode `bytes`, zero-padding to a multiple of 4: every 4 input bytes
    * (big-endian) become 5 alphabet chars. */
  def encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else java.util.Arrays.copyOf(bytes, ((bytes.length / 4) + 1) * 4)
    val sb = new java.lang.StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (padded(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div >= 1) {
        sb.append(Alphabet(((v / div) % 85).toInt))
        div /= 85
      }
      i += 4
    }
    sb.toString
  }

  /** Decode to exactly `outputLength` bytes (the encoder's zero padding is
    * dropped). The encoded length must be a multiple of 5 covering at
    * least `outputLength` bytes. */
  def decode(encoded: String, outputLength: Int): Array[Byte] = {
    require(encoded.length % 5 == 0,
      s"Z85 input length ${encoded.length} is not a multiple of 5")
    val full = encoded.length / 5 * 4
    require(outputLength <= full && outputLength >= full - 3,
      s"requested $outputLength bytes from ${encoded.length} Z85 chars")
    val out = new Array[Byte](full)
    var i = 0
    var o = 0
    while (i < encoded.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = encoded.charAt(i + j)
        val d = if (c < 128) Decode(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      var shift = 24
      while (shift >= 0) {
        out(o) = ((v >> shift) & 0xff).toByte
        o += 1
        shift -= 8
      }
      i += 5
    }
    if (outputLength == full) out else java.util.Arrays.copyOf(out, outputLength)
  }

  /** The 20-char Z85 form of a UUID (16 bytes, big-endian msb‖lsb) used in
    * DV file names. */
  def encodeUuid(uuid: java.util.UUID): String = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    encode(bb.array())
  }

  def decodeUuid(encoded: String): java.util.UUID = {
    require(encoded.length == 20, s"UUID Z85 form must be 20 chars: $encoded")
    val bytes = decode(encoded, 16)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    new java.util.UUID(bb.getLong, bb.getLong)
  }
}
