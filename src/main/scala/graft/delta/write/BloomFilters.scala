package graft.delta.write

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, input_file_name}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType, StructField, StructType}

import graft.delta.Metadata

/** Per-file Bloom filters for equality skipping (opt-in via
  * `delta.bloomFilter.columns`): min/max stats cannot prune a point
  * lookup when every file's range covers the key space (unsorted ids,
  * hashes, UUIDs) — the classic 100 TB needle-in-haystack. A small
  * per-file bitset (default 8 KiB) turns `key = x` into opening only
  * the files whose filter may contain x.
  *
  * Filters are built in ONE extra columnar pass over just-written files
  * reading ONLY the indexed columns (cost is opt-in and proportional to
  * the indexed width), stored as AddFile tags (`bloom.<col>` = base64
  * bitset), and consulted by [[graft.delta.read.DataSkipping]] for
  * `=` / `IN` conjuncts. Strictly conservative: a missing tag, an
  * unsupported type or a null literal keeps the file.
  *
  * Hashing is plain MD5 over `"<j>:<value-as-string>"` — the SAME Scala
  * function runs on the build and probe sides, so there is no
  * cross-representation drift; only string and integral columns are
  * indexed (their Spark cast-to-string is unambiguous).
  */
object BloomFilters {

  val ColumnsKey = "delta.bloomFilter.columns"
  val BitsKey = "delta.bloomFilter.bits"
  val TagPrefix = "bloom."
  /** Deliberately OUTSIDE the `bloom.` per-column namespace so a column
    * literally named "bits" cannot collide with it. */
  val BitsTag = "bloomBits"
  val NumHashes = 6
  val DefaultBits = 65536 // 8 KiB per file per column
  /** Auto-sizing: ~10 bits/key ≈ 1% FPP at k=6. A FIXED size saturates
    * at scale — at 10x the rows per file the default's bit density hit
    * ~0.8 and pruning collapsed to "open everything" (the r11 sf1 run
    * caught exactly this). Capped so the base64 tag cannot bloat the
    * log: 2^23 bits = 1 MiB bitset ≈ 1.4 MB base64 per file per column,
    * reached only past ~800k rows/file. Explicit `delta.bloomFilter
    * .bits` still wins. */
  val BitsPerKey = 10L
  val MaxAutoBits = 1 << 23

  def autoBits(rows: Long): Int =
    math.min(math.max(DefaultBits.toLong, rows * BitsPerKey),
      MaxAutoBits.toLong).toInt

  def indexedColumns(metadata: Metadata): Seq[String] =
    metadata.configuration.get(ColumnsKey).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      // partition columns prune via partitionValues; only data columns
      // of indexable type get filters. Configured names resolve CASE-
      // INSENSITIVELY (Spark's default resolution — 'ID' must find 'id')
      // and then carry the schema's spelling, so build and probe agree.
      // A name matching nothing is skipped, not refused: the config may
      // legitimately outlive a dropped column.
      .filterNot(c => metadata.partitionColumns
        .exists(_.equalsIgnoreCase(c)))
      .flatMap { c =>
        metadata.dataSchema.fields
          .find(_.name.equalsIgnoreCase(c))
          .filter(indexable)
          .map(_.name)
      }
      .distinct

  def bits(metadata: Metadata): Int =
    metadata.configuration.get(BitsKey).map(_.toInt).getOrElse(DefaultBits)

  def indexable(f: StructField): Boolean = f.dataType match {
    case StringType | LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** The k bit positions of one value. Called on both sides. */
  def positions(value: String, bits: Int): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(NumHashes) { j =>
      val d = md.digest(s"$j:$value".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (h % bits).toInt
    }
  }

  def mightContain(base64: String, bits: Int, value: String): Boolean = {
    val bytes = java.util.Base64.getDecoder.decode(base64)
    positions(value, bits).forall { p =>
      val byteIdx = p >>> 3
      byteIdx < bytes.length && (bytes(byteIdx) & (1 << (p & 7))) != 0
    }
  }

  /** Build filters for `files` (freshly written, all under one batch
    * dir): one distributed pass reading only the indexed columns;
    * returns file NAME (basename, unique within a batch) → col →
    * base64. `physicalName` maps logical to parquet column names. */
  /** Key a data file within one write batch: the path RELATIVE to the
    * (uuid-named) batch directory. Basenames are NOT unique across
    * partition directories — dynamic-partition tasks write the same
    * part-00000-… name under every partition dir, and a basename key
    * would merge (and mis-size) their filters.
    *
    * `full` must be the `input_file_name()` spelling on BOTH sides —
    * `path.toUri.toString`, i.e. [[keySpelling]] of the driver's
    * FileStatus path. An asymmetric pair (decoded driver / encoded
    * executor) double-decodes one side: a partition dir whose escaped
    * value contains a literal `%XX` (Spark escapes specials as %-codes)
    * would key differently and silently lose its filter. */
  private[write] def keySpelling(p: Path): String = p.toUri.toString
  private[write] def batchRelativeKey(batchName: String)(full: String): String = {
    val decoded =
      try new java.net.URI(full).getPath
      catch { case _: Exception => full }
    val withPath = if (decoded == null) full else decoded
    val marker = "/" + batchName + "/"
    val i = withPath.indexOf(marker)
    if (i >= 0) withPath.substring(i + marker.length)
    else withPath.split('/').last
  }

  /** Per-file filters plus the per-file bit WIDTH used (rows-adaptive
    * via [[autoBits]] unless `delta.bloomFilter.bits` fixes it):
    * batch-relative key → (col → base64, bits). `rowsByFile` supplies
    * each file's row count (from the stats pass that already ran) so
    * sizing needs no extra read; it is keyed the same way. */
  def build(spark: SparkSession, files: Seq[Path],
            metadata: Metadata,
            physicalName: String => String,
            rowsByFile: Map[String, Long] = Map.empty,
            batchName: String = "")
      : Map[String, (Map[String, String], Int)] = {
    val cols = indexedColumns(metadata)
    if (cols.isEmpty || files.isEmpty) return Map.empty
    val keyOf = batchRelativeKey(batchName) _
    val explicit = metadata.configuration.get(BitsKey).map(_.toInt)
    val bitsByFile: Map[String, Int] = files.map { p =>
      val k = keyOf(keySpelling(p))
      k -> explicit.getOrElse(autoBits(rowsByFile.getOrElse(k, 0L)))
    }.toMap
    val physSchema = StructType(metadata.dataSchema.fields.map(f =>
      f.copy(name = physicalName(f.name))))
    val physCols = cols.map(physicalName)
    import spark.implicits._
    val projected = spark.read.schema(physSchema)
      .parquet(files.map(_.toString): _*)
      .select(input_file_name().as("__file") +:
        physCols.map(c => col(s"`$c`").cast("string").as(c)): _*)
    val nCols = physCols.size
    val bBits = spark.sparkContext.broadcast(bitsByFile)
    val bName = batchName
    projected.mapPartitions { rows =>
      val keyFn = batchRelativeKey(bName) _
      val acc = scala.collection.mutable.HashMap.empty[(String, Int), Array[Long]]
      rows.foreach { r =>
        val file = keyFn(r.getString(0))
        val nBits = bBits.value.getOrElse(file, DefaultBits)
        val words = (nBits + 63) / 64
        var i = 0
        while (i < nCols) {
          if (!r.isNullAt(i + 1)) {
            val bitset = acc.getOrElseUpdate((file, i), new Array[Long](words))
            positions(r.getString(i + 1), nBits).foreach { p =>
              bitset(p >>> 6) |= 1L << (p & 63)
            }
          }
          i += 1
        }
      }
      acc.iterator.map { case ((f, i), b) => (f, i, b) }
    }.groupByKey(t => (t._1, t._2))
      .reduceGroups { (a, b) =>
        val merged = a._3.clone()
        var i = 0
        while (i < merged.length) { merged(i) |= b._3(i); i += 1 }
        (a._1, a._2, merged)
      }
      .map(_._2)
      .collect()
      .groupBy(_._1)
      .map { case (file, entries) =>
        val nBits = bitsByFile.getOrElse(file, DefaultBits)
        val words = (nBits + 63) / 64
        file -> (entries.map { case (_, i, bitset) =>
          val bytes = new Array[Byte](words * 8)
          var w = 0
          while (w < words) {
            var k = 0
            while (k < 8) {
              bytes(w * 8 + k) = ((bitset(w) >>> (8 * k)) & 0xff).toByte
              k += 1
            }
            w += 1
          }
          // tags carry the LOGICAL name: the probe side matches filter
          // attributes (logical), and physical names were only needed to
          // read the parquet back
          cols(i) -> java.util.Base64.getEncoder.encodeToString(bytes)
        }.toMap, nBits)
      }
  }
}
