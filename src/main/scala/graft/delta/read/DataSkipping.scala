package graft.delta.read

import java.time.{Instant, LocalDate}

import scala.util.control.NonFatal

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.delta.{AddFile, JsonCodec, ParsedStats}

/** File-level data skipping from `AddFile.stats` min/max/nullCount.
  *
  * The second half of the scan-pruning story (partition pruning being the
  * first, ref FilteredDeltaScanImpl.scala:39-81): a data-column conjunct
  * like `l_shipdate >= '1994-01-01'` can't prune partitions, but it CAN
  * prove whole files irrelevant from their per-file min/max — at 100 TB
  * this is the difference between opening every file and opening the few
  * whose range overlaps the predicate.
  *
  * Strictly conservative three-way logic: `mayMatch` returns false only
  * when the stats PROVE no row of the file can satisfy the conjunct;
  * unsupported expression shapes, missing stats, parse failures, NaN
  * literals and non-literal operands all keep the file. String bounds
  * compare as [[UTF8String]] (byte-wise), the same unsigned lexicographic
  * order parquet's UTF8 TYPE_DEFINED_ORDER used to produce them.
  */
object DataSkipping {

  /** Per-column bounds parsed from one file's stats JSON. */
  private case class ColStats(
      min: Option[Any], max: Option[Any], nullCount: Option[Long])
  private case class FileStats(
      numRecords: Option[Long], cols: Map[String, ColStats],
      blooms: Map[String, String] = Map.empty, bloomBits: Int = 0)

  /** Files that may contain rows matching every data conjunct. */
  def filterFiles(files: Seq[AddFile], dataFilters: Seq[Expression],
                  dataSchema: StructType): Seq[AddFile] = {
    if (dataFilters.isEmpty) return files
    val types = columnTypes(dataSchema)
    files.filter(f => mayKeep(f, dataFilters, types))
  }

  def columnTypes(dataSchema: StructType): Map[String, DataType] =
    dataSchema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap

  /** Single-file form — usable inside a distributed `Dataset.filter`
    * (everything it touches is serializable and driver-free). */
  def mayKeep(f: AddFile, dataFilters: Seq[Expression],
              types: Map[String, DataType]): Boolean =
    parse(f) match {
      case None => true
      case Some(stats) => dataFilters.forall(c => mayMatch(c, stats, types))
    }

  /** Jackson tree-parses performed on raw stats JSON — observability for
    * the stats_parsed fast path (specs assert a checkpointed table's
    * pruning never increments it). */
  private[graft] val statsJsonParses = new java.util.concurrent.atomic.AtomicLong

  /** Parse raw stats JSON into the checkpoint-persistable form (one
    * Jackson walk; values keep their JSON-text rendering). */
  def parseRaw(raw: String): Option[ParsedStats] = try {
    statsJsonParses.incrementAndGet()
    val node = JsonCodec.mapper.readTree(raw)
    def obj(name: String): Map[String, com.fasterxml.jackson.databind.JsonNode] = {
      val o = node.get(name)
      if (o == null || !o.isObject) Map.empty
      else {
        val b = Map.newBuilder[String, com.fasterxml.jackson.databind.JsonNode]
        o.fields().forEachRemaining(e => b += e.getKey.toLowerCase -> e.getValue)
        b.result()
      }
    }
    Some(ParsedStats(
      numRecords = Option(node.get("numRecords")).filter(_.isNumber).map(_.asLong),
      minValues = obj("minValues").collect {
        case (k, v) if !v.isNull && !v.isContainerNode => k -> v.asText },
      maxValues = obj("maxValues").collect {
        case (k, v) if !v.isNull && !v.isContainerNode => k -> v.asText },
      nullCount = obj("nullCount").collect {
        case (k, v) if v.isNumber => k -> v.asLong }))
  } catch { case NonFatal(_) => None }

  /** Attach the parsed form once (no-op when already present) — called
    * on the checkpoint write path so every checkpointed file carries it. */
  def withParsedStats(f: AddFile): AddFile =
    if (f.stats_parsed.isDefined || f.stats.isEmpty) f
    else f.copy(stats_parsed = parseRaw(f.stats.get))

  private def parse(f: AddFile): Option[FileStats] = {
    // per-file Bloom filters ride in the tags (write.BloomFilters)
    val tags = f.tags.getOrElse(Map.empty)
    val blooms = tags.collect {
      case (k, v) if k.startsWith(graft.delta.write.BloomFilters.TagPrefix) &&
          k != graft.delta.write.BloomFilters.BitsTag =>
        k.stripPrefix(graft.delta.write.BloomFilters.TagPrefix).toLowerCase -> v
    }
    val bloomBits = tags.get(graft.delta.write.BloomFilters.BitsTag)
      .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(0)
    // fast path: a checkpoint-supplied parsed struct skips the Jackson
    // walk entirely — string values normalize per comparison exactly
    // like JSON-sourced text does
    val fromParsed = f.stats_parsed.map { p =>
      val cols = (p.minValues.keySet ++ p.maxValues.keySet ++ p.nullCount.keySet)
        .map(c => c -> ColStats(
          p.minValues.get(c), p.maxValues.get(c), p.nullCount.get(c))).toMap
      FileStats(p.numRecords, cols, blooms, bloomBits)
    }
    fromParsed
      .orElse(parseStats(f, blooms, bloomBits))
      .orElse(if (blooms.nonEmpty && bloomBits > 0)
        Some(FileStats(None, Map.empty, blooms, bloomBits)) else None)
  }

  private def parseStats(f: AddFile, blooms: Map[String, String],
                         bloomBits: Int): Option[FileStats] = f.stats.flatMap { raw =>
    try {
      statsJsonParses.incrementAndGet()
      val node = JsonCodec.mapper.readTree(raw)
      def obj(name: String): Map[String, com.fasterxml.jackson.databind.JsonNode] = {
        val o = node.get(name)
        if (o == null || !o.isObject) Map.empty
        else {
          val b = Map.newBuilder[String, com.fasterxml.jackson.databind.JsonNode]
          o.fields().forEachRemaining(e => b += e.getKey.toLowerCase -> e.getValue)
          b.result()
        }
      }
      val mins = obj("minValues"); val maxs = obj("maxValues"); val nulls = obj("nullCount")
      val cols = (mins.keySet ++ maxs.keySet ++ nulls.keySet).map { c =>
        c -> ColStats(
          mins.get(c).map(jsonValue),
          maxs.get(c).map(jsonValue),
          nulls.get(c).filter(_.isNumber).map(_.asLong))
      }.toMap
      Some(FileStats(
        Option(node.get("numRecords")).filter(_.isNumber).map(_.asLong), cols,
        blooms, bloomBits))
    } catch { case NonFatal(_) => None }
  }

  private def jsonValue(n: com.fasterxml.jackson.databind.JsonNode): Any =
    if (n.isTextual) n.asText
    else if (n.isIntegralNumber) n.asLong
    else if (n.isFloatingPointNumber) n.asDouble
    else if (n.isBoolean) n.asBoolean
    else null

  // ----------------------------------------------------------------- eval
  /** Can any row of the file satisfy `e`? (false ⇒ provably not). */
  private def mayMatch(e: Expression, fs: FileStats,
                       types: Map[String, DataType]): Boolean = e match {
    case And(l, r) => mayMatch(l, fs, types) && mayMatch(r, fs, types)
    case Or(l, r) => mayMatch(l, fs, types) || mayMatch(r, fs, types)

    case EqualTo(a: Attribute, l: Literal) => cmpMayMatch(a, l, fs, types, "=")
    case EqualTo(l: Literal, a: Attribute) => cmpMayMatch(a, l, fs, types, "=")
    case LessThan(a: Attribute, l: Literal) => cmpMayMatch(a, l, fs, types, "<")
    case LessThan(l: Literal, a: Attribute) => cmpMayMatch(a, l, fs, types, ">")
    case LessThanOrEqual(a: Attribute, l: Literal) => cmpMayMatch(a, l, fs, types, "<=")
    case LessThanOrEqual(l: Literal, a: Attribute) => cmpMayMatch(a, l, fs, types, ">=")
    case GreaterThan(a: Attribute, l: Literal) => cmpMayMatch(a, l, fs, types, ">")
    case GreaterThan(l: Literal, a: Attribute) => cmpMayMatch(a, l, fs, types, "<")
    case GreaterThanOrEqual(a: Attribute, l: Literal) => cmpMayMatch(a, l, fs, types, ">=")
    case GreaterThanOrEqual(l: Literal, a: Attribute) => cmpMayMatch(a, l, fs, types, "<=")

    case EqualNullSafe(a: Attribute, l: Literal) =>
      if (l.value == null) colStats(a, fs).flatMap(_.nullCount).forall(_ > 0)
      else cmpMayMatch(a, l, fs, types, "=")
    case EqualNullSafe(l: Literal, a: Attribute) =>
      mayMatch(EqualNullSafe(a, l), fs, types)

    case In(a: Attribute, list) if list.forall(_.isInstanceOf[Literal]) =>
      list.exists(l => cmpMayMatch(a, l.asInstanceOf[Literal], fs, types, "="))
    case InSet(a: Attribute, set) =>
      types.get(a.name.toLowerCase).forall(dt =>
        set.exists(v => cmpMayMatch(a, Literal(v, dt), fs, types, "=")))

    case IsNull(a: Attribute) =>
      colStats(a, fs).flatMap(_.nullCount).forall(_ > 0)
    case IsNotNull(a: Attribute) =>
      (for { cs <- colStats(a, fs); n <- cs.nullCount; total <- fs.numRecords }
        yield n < total).getOrElse(true)

    case StartsWith(a: Attribute, Literal(prefix: UTF8String, StringType)) =>
      prefixMayMatch(a, prefix, fs, types)

    case _ => true
  }

  private def colStats(a: Attribute, fs: FileStats): Option[ColStats] =
    fs.cols.get(a.name.toLowerCase)

  /** Is `col op lit` possibly true given the file's [min, max]? */
  private def cmpMayMatch(a: Attribute, lit: Literal, fs: FileStats,
                          types: Map[String, DataType], op: String): Boolean = {
    if (lit.value == null) return false // comparison with null is never true
    val dt = types.get(a.name.toLowerCase).getOrElse(return true)
    // the Bloom check stands on its own: a column OUTSIDE the indexed-
    // stats width (or with unparseable stats) may still carry a filter —
    // consult it before any stats-absence early return
    if (op == "=" && !bloomMayContain(a, lit, fs, dt)) return false
    val cs = colStats(a, fs).getOrElse(return true)
    // all-null file: no comparison can hold
    if ((for (n <- cs.nullCount; t <- fs.numRecords) yield n >= t).contains(true)) {
      return false
    }
    val bounds = for {
      lo <- cs.min.flatMap(v => toComparable(v, dt))
      hi <- cs.max.flatMap(v => toComparable(v, dt))
      v <- litComparable(lit.value, dt)
    } yield (lo, hi, v)
    val rangeVerdict = bounds match {
      case None => true
      case Some((lo, hi, v)) => op match {
        case "=" => cmp(lo, v) <= 0 && cmp(v, hi) <= 0
        case "<" => cmp(lo, v) < 0 // some row < v iff min < v
        case "<=" => cmp(lo, v) <= 0
        case ">" => cmp(v, hi) < 0
        case ">=" => cmp(v, hi) <= 0
      }
    }
    rangeVerdict
  }

  /** The file's Bloom filter verdict for `a = lit` — the pruner for
    * point lookups where every file's [min,max] covers the key space
    * (unsorted ids/hashes). Conservative on any absence. */
  private def bloomMayContain(a: Attribute, lit: Literal, fs: FileStats,
                              dt: DataType): Boolean =
    fs.blooms.get(a.name.toLowerCase) match {
      case Some(b64) if fs.bloomBits > 0 && bloomStringable(dt) =>
        graft.delta.write.BloomFilters.mightContain(
          b64, fs.bloomBits, lit.value.toString)
      case _ => true
    }

  /** Types whose internal-value toString equals Spark's cast-to-string
    * (what the build side hashed). */
  private def bloomStringable(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private def prefixMayMatch(a: Attribute, prefix: UTF8String, fs: FileStats,
                             types: Map[String, DataType]): Boolean = {
    if (!types.get(a.name.toLowerCase).contains(StringType)) return true
    val cs = colStats(a, fs).getOrElse(return true)
    (cs.min, cs.max) match {
      case (Some(lo: String), Some(hi: String)) =>
        val n = prefix.numBytes()
        val loT = truncateBytes(UTF8String.fromString(lo), n)
        val hiT = truncateBytes(UTF8String.fromString(hi), n)
        // rows with the prefix exist only if prefix ∈ [min, max] truncated
        loT.compareTo(prefix) <= 0 && prefix.compareTo(hiT) <= 0
      case _ => true
    }
  }

  private def truncateBytes(s: UTF8String, n: Int): UTF8String = {
    val b = s.getBytes
    if (b.length <= n) s else UTF8String.fromBytes(java.util.Arrays.copyOf(b, n))
  }

  /** Normalize a stats-JSON value to the comparison domain of `dt`. */
  /** Stats-JSON text → comparable value and the shared comparator —
    * exposed for the metadata-only aggregate fold, which must order
    * stats texts with EXACTLY the skipping semantics. */
  private[graft] def textComparable(v: String, dt: DataType): Option[Any] =
    toComparable(v, dt)
  private[graft] def compareComparables(a: Any, b: Any): Int = cmp(a, b)

  private def toComparable(v: Any, dt: DataType): Option[Any] = try {
    dt match {
      case StringType => Some(UTF8String.fromString(v.asInstanceOf[String]))
      case DateType => Some(LocalDate.parse(v.asInstanceOf[String]).toEpochDay)
      case TimestampType =>
        val i = Instant.parse(v.asInstanceOf[String])
        Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      case TimestampNTZType =>
        val ldt = java.time.LocalDateTime.parse(v.asInstanceOf[String])
        Some(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L)
      case BooleanType => Some(if (v.asInstanceOf[Boolean]) 1L else 0L)
      case ByteType | ShortType | IntegerType | LongType =>
        Some(new java.math.BigDecimal(v.toString))
      case FloatType | DoubleType | _: DecimalType =>
        Some(new java.math.BigDecimal(v.toString))
      case _ => None
    }
  } catch { case NonFatal(_) => None }

  /** Normalize a Catalyst literal value (internal representation) the same
    * way; NaN yields None (keep the file). */
  private def litComparable(v: Any, dt: DataType): Option[Any] = try {
    dt match {
      case StringType => Some(v.asInstanceOf[UTF8String])
      case DateType => Some(v.asInstanceOf[Int].toLong) // days
      case TimestampType | TimestampNTZType => Some(v.asInstanceOf[Long]) // micros
      case BooleanType => Some(if (v.asInstanceOf[Boolean]) 1L else 0L)
      case ByteType | ShortType | IntegerType | LongType =>
        Some(new java.math.BigDecimal(v.toString))
      case FloatType =>
        val f = v.asInstanceOf[Float]
        if (f.isNaN) None else Some(new java.math.BigDecimal(f.toString))
      case DoubleType =>
        val d = v.asInstanceOf[Double]
        if (d.isNaN) None else Some(new java.math.BigDecimal(d.toString))
      case _: DecimalType =>
        Some(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal)
      case _ => None
    }
  } catch { case NonFatal(_) => None }

  @SuppressWarnings(Array("unchecked"))
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: UTF8String, y: UTF8String) => x.compareTo(y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case _ => 0 // incomparable — treat as overlapping (keep)
  }
}
