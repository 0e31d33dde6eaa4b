package graft.delta.dv

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

/** A 64-bit bitmap as an array of 32-bit Roaring bitmaps, implementing the
  * "portable" serialization the Delta protocol prescribes for deletion
  * vectors (PROTOCOL.md "Deletion Vectors"; the container-level layout is
  * the public RoaringFormatSpec shared by CRoaring/RoaringBitmap).
  *
  * A 64-bit value `v` lives in 32-bit bitmap number `v >>> 32` at 32-bit
  * position `v & 0xFFFFFFFF`; each 32-bit bitmap splits its values into
  * containers keyed by the upper 16 bits, holding the lower 16:
  *
  *  - '''array''' container (cardinality ≤ 4096): sorted `uint16` values;
  *  - '''bitmap''' container: 8 KiB bitset (1024 little-endian longs);
  *  - '''run''' container: `(start, length-1)` `uint16` pairs.
  *
  * Deserialization accepts all three (foreign writers may run-compress);
  * serialization emits the run-free cookie (12346) with array/bitmap
  * containers — always-valid portable output.
  *
  * This is a purpose-built reader/builder, not a general bitmap library:
  * only the operations the DV read path needs (membership, iteration,
  * cardinality, building) exist, all on the serialized-format's own
  * container model so (de)serialization is structural, not translated.
  */
final class RoaringBitmapArray private (
    /** bitmap index → container key → sorted container values.
      * Kept normalized: no empty maps at the END of the array (trailing
      * empty bitmaps would change the serialized form), though interior
      * empty bitmaps are preserved (the portable format writes them). */
    private val bitmaps: mutable.ArrayBuffer[
      mutable.SortedMap[Int, RoaringBitmapArray.Container]]) {

  import RoaringBitmapArray._

  def add(value: Long): Unit = {
    require(value >= 0, s"negative value $value")
    val high = (value >>> 32).toInt
    val low = value.toInt // 32-bit part, as unsigned
    while (bitmaps.size <= high) bitmaps += mutable.SortedMap.empty
    val key = low >>> 16
    val bit = low & 0xffff
    val m = bitmaps(high)
    m.get(key) match {
      case None => m(key) = Container.single(bit)
      case Some(c) => m(key) = c.add(bit)
    }
  }

  def contains(value: Long): Boolean = {
    if (value < 0) return false
    val high = (value >>> 32).toInt
    if (high >= bitmaps.size) return false
    val low = value.toInt
    bitmaps(high).get(low >>> 16).exists(_.contains(low & 0xffff))
  }

  def cardinality: Long =
    bitmaps.iterator.flatMap(_.valuesIterator).map(_.cardinality.toLong).sum

  /** All values in ascending order. */
  def values: Iterator[Long] =
    bitmaps.iterator.zipWithIndex.flatMap { case (m, high) =>
      m.iterator.flatMap { case (key, c) =>
        c.values.map(bit =>
          (high.toLong << 32) | (key.toLong << 16) | bit.toLong)
      }
    }

  def isEmpty: Boolean = bitmaps.forall(_.isEmpty)

  /** In-place union: container-wise merge of two sorted arrays — O(n+m)
    * per container, replacing the O(n·m) one-bit-at-a-time `add` loop a
    * caller would otherwise need (merging a full 65k-value container by
    * `add` is quadratic: each insert copies the array). Union only adds
    * values, so the no-trailing-empty-bitmap invariant is preserved. */
  def union(other: RoaringBitmapArray): Unit = {
    while (bitmaps.size < other.bitmaps.size) bitmaps += mutable.SortedMap.empty
    var high = 0
    while (high < other.bitmaps.size) {
      val m = bitmaps(high)
      other.bitmaps(high).foreach { case (key, oc) =>
        m.get(key) match {
          case None => m(key) = oc
          case Some(c) => m(key) = c.union(oc)
        }
      }
      high += 1
    }
  }

  /** Portable serialization: magic ‖ number-of-bitmaps (8B LE) ‖ each
    * 32-bit bitmap with the run-free cookie + offset header. */
  def serialize(): Array[Byte] = {
    val bufs = bitmaps.map(serializeBitmap)
    val total = 4 + 8 + bufs.map(_.length).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(PortableMagic)
    bb.putLong(bitmaps.size.toLong)
    bufs.foreach(bb.put)
    bb.array()
  }

  private def serializeBitmap(
      m: mutable.SortedMap[Int, Container]): Array[Byte] = {
    val n = m.size
    val containerBytes = m.valuesIterator.map(_.serializedSize).sum
    val bb = ByteBuffer.allocate(4 + 4 + 4 * n + 4 * n + containerBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(CookieNoRun)
    bb.putInt(n)
    m.foreach { case (key, c) =>
      bb.putShort(key.toShort)
      bb.putShort((c.cardinality - 1).toShort)
    }
    // offset header: byte positions of each container from bitmap start
    var off = 4 + 4 + 4 * n + 4 * n
    m.valuesIterator.foreach { c =>
      bb.putInt(off)
      off += c.serializedSize
    }
    m.valuesIterator.foreach(_.serializeInto(bb))
    bb.array()
  }
}

object RoaringBitmapArray {

  /** Magic number of the PORTABLE RoaringBitmapArray format (the only
    * format the Delta protocol allows in deletion vectors). */
  val PortableMagic = 1681511377

  private val CookieNoRun = 12346
  private val CookieWithRun = 12347
  private val ArrayMaxCardinality = 4096
  /** With the run cookie, the offset header only exists at ≥ 4 keys. */
  private val NoOffsetThreshold = 4

  def apply(values: Long*): RoaringBitmapArray =
    fromUnsorted(values.toArray)

  /** Bulk builder: sort once, then slice directly into containers —
    * O(n log n) total, where repeated `add` is O(n) PER VALUE once a
    * container grows (every insert copies its sorted array; building a
    * dense 65k-value container that way is ~2e9 element moves). This is
    * the path every DV build takes (positions arrive unsorted from a
    * distributed scan), so the builder's complexity IS the DELETE's
    * executor-side cost profile. Duplicates collapse. */
  def fromUnsorted(values: Array[Long]): RoaringBitmapArray = {
    if (values.isEmpty) return empty()
    val sorted = values.clone()
    java.util.Arrays.sort(sorted)
    require(sorted(0) >= 0, s"negative value ${sorted(0)}")
    val arr = mutable.ArrayBuffer.empty[mutable.SortedMap[Int, Container]]
    var i = 0
    val n = sorted.length
    while (i < n) {
      val v = sorted(i)
      val high = (v >>> 32).toInt
      val key = (v.toInt) >>> 16
      // scan the run of values sharing (high, key): they form one container
      val prefix = v >>> 16 // high 48 bits identify the container
      var j = i
      while (j < n && (sorted(j) >>> 16) == prefix) j += 1
      val buf = new Array[Int](j - i)
      var o = 0
      var k = i
      var last = -1
      while (k < j) {
        val bit = sorted(k).toInt & 0xffff
        if (bit != last) { buf(o) = bit; o += 1; last = bit }
        k += 1
      }
      while (arr.size <= high) arr += mutable.SortedMap.empty
      arr(high)(key) =
        Container(if (o == buf.length) buf else java.util.Arrays.copyOf(buf, o))
      i = j
    }
    new RoaringBitmapArray(arr)
  }

  def empty(): RoaringBitmapArray =
    new RoaringBitmapArray(mutable.ArrayBuffer.empty)

  /** Deserialize the portable format produced by any conforming writer
    * (array, bitmap AND run containers accepted). */
  def deserialize(bytes: Array[Byte]): RoaringBitmapArray = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == PortableMagic,
      s"unsupported deletion-vector bitmap magic $magic " +
        s"(expected portable $PortableMagic)")
    val n = bb.getLong
    require(n >= 0 && n <= Int.MaxValue, s"absurd bitmap count $n")
    val arr = mutable.ArrayBuffer.fill(n.toInt)(
      mutable.SortedMap.empty[Int, Container])
    var i = 0
    while (i < n) {
      deserializeBitmapInto(bb, arr(i))
      i += 1
    }
    new RoaringBitmapArray(arr)
  }

  private def deserializeBitmapInto(
      bb: ByteBuffer, into: mutable.SortedMap[Int, Container]): Unit = {
    val cookie = bb.getInt
    val hasRuns = (cookie & 0xffff) == CookieWithRun
    require(hasRuns || cookie == CookieNoRun,
      s"unrecognized roaring cookie $cookie")
    val size = if (hasRuns) (cookie >>> 16) + 1 else bb.getInt
    val runFlags: Array[Byte] =
      if (hasRuns) {
        val f = new Array[Byte]((size + 7) / 8)
        bb.get(f)
        f
      } else Array.emptyByteArray
    def isRun(idx: Int): Boolean =
      hasRuns && (runFlags(idx / 8) & (1 << (idx % 8))) != 0
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    var i = 0
    while (i < size) {
      keys(i) = bb.getShort & 0xffff
      cards(i) = (bb.getShort & 0xffff) + 1
      i += 1
    }
    // offset header: always with the run-free cookie; with runs only at
    // NoOffsetThreshold+ keys. Containers are stored in key order, so
    // sequential reading never needs the offsets themselves.
    if (!hasRuns || size >= NoOffsetThreshold) bb.position(bb.position() + 4 * size)
    i = 0
    while (i < size) {
      val c =
        if (isRun(i)) Container.readRuns(bb)
        else if (cards(i) > ArrayMaxCardinality) Container.readBitset(bb, cards(i))
        else Container.readArray(bb, cards(i))
      into(keys(i)) = c
      i += 1
    }
  }

  /** One 16-bit-keyed container: a sorted array of `uint16` values. The
    * in-memory model is always the sorted-array form (simple, and DV
    * bitmaps are read once then iterated); the FORMAT distinction between
    * array/bitmap/run exists only at the (de)serialization boundary. */
  final case class Container(sorted: Array[Int]) {
    def cardinality: Int = sorted.length
    def contains(bit: Int): Boolean =
      java.util.Arrays.binarySearch(sorted, bit) >= 0
    def add(bit: Int): Container = {
      val idx = java.util.Arrays.binarySearch(sorted, bit)
      if (idx >= 0) this
      else {
        val at = -idx - 1
        val out = new Array[Int](sorted.length + 1)
        System.arraycopy(sorted, 0, out, 0, at)
        out(at) = bit
        System.arraycopy(sorted, at, out, at + 1, sorted.length - at)
        Container(out)
      }
    }
    def values: Iterator[Int] = sorted.iterator

    /** Sorted-array union with `other` — one linear merge pass. */
    def union(other: Container): Container = {
      val a = sorted; val b = other.sorted
      if (a.isEmpty) return other
      if (b.isEmpty) return this
      val out = new Array[Int](a.length + b.length)
      var i = 0; var j = 0; var o = 0
      while (i < a.length && j < b.length) {
        val av = a(i); val bv = b(j)
        if (av < bv) { out(o) = av; i += 1 }
        else if (av > bv) { out(o) = bv; j += 1 }
        else { out(o) = av; i += 1; j += 1 }
        o += 1
      }
      while (i < a.length) { out(o) = a(i); i += 1; o += 1 }
      while (j < b.length) { out(o) = b(j); j += 1; o += 1 }
      Container(if (o == out.length) out else java.util.Arrays.copyOf(out, o))
    }

    def serializedSize: Int =
      if (cardinality > ArrayMaxCardinality) 8192 else 2 * cardinality

    def serializeInto(bb: ByteBuffer): Unit =
      if (cardinality > ArrayMaxCardinality) {
        val words = new Array[Long](1024)
        sorted.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
        words.foreach(bb.putLong)
      } else {
        sorted.foreach(v => bb.putShort(v.toShort))
      }
  }

  object Container {
    def single(bit: Int): Container = Container(Array(bit))

    def readArray(bb: ByteBuffer, card: Int): Container = {
      val vs = new Array[Int](card)
      var i = 0
      while (i < card) { vs(i) = bb.getShort & 0xffff; i += 1 }
      Container(vs)
    }

    def readBitset(bb: ByteBuffer, card: Int): Container = {
      val vs = new Array[Int](card)
      var o = 0
      var w = 0
      while (w < 1024) {
        var word = bb.getLong
        val base = w << 6
        while (word != 0) {
          vs(o) = base + java.lang.Long.numberOfTrailingZeros(word)
          o += 1
          word &= word - 1
        }
        w += 1
      }
      require(o == card, s"bitmap container held $o values, header said $card")
      Container(vs)
    }

    def readRuns(bb: ByteBuffer): Container = {
      val nRuns = bb.getShort & 0xffff
      val out = mutable.ArrayBuilder.make[Int]
      var r = 0
      while (r < nRuns) {
        val start = bb.getShort & 0xffff
        val len = bb.getShort & 0xffff
        // a run past the 16-bit container space is a corrupt/malformed
        // DV: values above 0xFFFF would silently truncate through
        // toShort on re-serialization (merging shades) and mark the
        // WRONG rows deleted — fail the parse loudly instead
        require(start + len <= 0xffff,
          s"corrupt run container: run [$start, ${start + len}] exceeds " +
            "the 16-bit value space")
        var v = start
        while (v <= start + len) { out += v; v += 1 }
        r += 1
      }
      Container(out.result())
    }
  }
}
