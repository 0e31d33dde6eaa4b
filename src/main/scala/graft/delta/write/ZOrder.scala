package graft.delta.write

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering key for OPTIMIZE.
  *
  * Each clustering column maps to a `Bits`-bit bucket id; the z-value
  * interleaves the buckets' bits so that sorting by it groups rows into
  * hyper-rectangles of the clustering space. Written with per-file
  * min/max stats, every output file then covers a SMALL box of every
  * clustering column — which is what makes stats-based data skipping
  * ([[graft.delta.read.DataSkipping]]) effective on MULTI-column
  * predicates, where sorting by one column leaves the others unclustered.
  *
  * Bucketing is type-directed and stays codegen'd (all built-ins):
  *  - numeric / date / timestamp / boolean → `width_bucket` over the
  *    observed [min, max] (one agg job): uniform buckets preserve RANGE
  *    locality, so both equality and range predicates skip;
  *  - string → the first 7 UTF-8 bytes as a big-endian number (zero
  *    right-padded, so the encoding is ORDER-PRESERVING on prefixes),
  *    then the same width_bucket: per-file string min/max stay
  *    lexicographically tight, which is what stats-based skipping
  *    compares — a hash bucket would cluster storage but leave every
  *    file's [min, max] spanning the whole domain;
  *  - everything else (binary, complex) → `xxhash64 & mask`
  *    (equality-only clustering).
  *
  * Public background: Morton curves for multidimensional clustering are
  * standard literature (e.g. the Delta Lake OPTIMIZE ZORDER docs and the
  * original Morton 1966 technical report).
  */
object ZOrder {

  val Bits = 8
  private val Buckets = 1 << Bits

  def isRangeType(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType |
         BooleanType | StringType => true
    case _ => false
  }

  /** Order-preserving double encoding used for bounds and bucketing. */
  private def encoded(c: String, dt: DataType): Column = dt match {
    case DateType => col(c).cast(TimestampType).cast(DoubleType)
    case StringType =>
      // first 7 bytes, zero-padded, as an unsigned big-endian number:
      // preserves UTF8-byte order (the order string min/max compare in)
      expr(s"CAST(conv(hex(rpad(CAST(`$c` AS BINARY), 7, x'00')), 16, 10) AS DOUBLE)")
    case _ => col(c).cast(DoubleType)
  }

  /** The interleaved z-value for `cols` of `df` (runs one min/max agg
    * job over the range-typed columns). */
  def zValue(df: DataFrame, cols: Seq[String]): Column =
    clusterValue(df, cols, hilbert = false)

  /** Clustering key over `cols`: Morton interleave (explicit ZORDER BY)
    * or the Hilbert index (liquid-clustered OPTIMIZE — every curve step
    * moves one bucket in one dimension, so per-file min/max boxes stay
    * tighter than Morton's power-of-two diagonal jumps). Both share the
    * type-directed bucketing above. */
  def clusterValue(df: DataFrame, cols: Seq[String],
                   hilbert: Boolean): Column = {
    require(cols.nonEmpty, "zOrderBy needs at least one column")
    require(cols.size * Bits <= 62, s"too many z-order columns: ${cols.size}")
    val schema = df.schema
    val rangeCols = cols.filter(c => isRangeType(schema(c).dataType))
    val bounds: Map[String, (Double, Double)] =
      if (rangeCols.isEmpty) Map.empty
      else {
        val aggs = rangeCols.flatMap { c =>
          val v = encoded(c, schema(c).dataType)
          Seq(min(v).as(s"min_$c"), max(v).as(s"max_$c"))
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        rangeCols.map { c =>
          val lo = Option(row.getAs[Any](s"min_$c")).fold(0.0)(_.toString.toDouble)
          val hi = Option(row.getAs[Any](s"max_$c")).fold(0.0)(_.toString.toDouble)
          c -> (lo, hi)
        }.toMap
      }

    val buckets: Seq[Column] = cols.map { c =>
      val dt = schema(c).dataType
      if (isRangeType(dt)) {
        val (lo, hi) = bounds(c)
        if (lo >= hi) lit(0L)
        else {
          // width_bucket: 1..n in range; clamp the edges, nulls to 0
          val wb = width_bucket(encoded(c, dt), lit(lo), lit(hi),
            lit(Buckets)) - 1
          coalesce(least(greatest(wb, lit(0L)), lit((Buckets - 1).toLong)), lit(0L))
        }
      } else {
        coalesce(pmod(xxhash64(col(c)), lit(Buckets.toLong)), lit(0L))
      }
    }

    if (hilbert) {
      graft.functions.HilbertIndex(buckets.map(_.cast(LongType)), Bits)
    } else {
      // interleave: bit i of bucket j lands at position i*n + j
      val n = cols.size
      val terms = for {
        i <- 0 until Bits
        j <- 0 until n
      } yield shiftleft(
        shiftright(buckets(j), i).bitwiseAND(lit(1L)), i * n + j)
      terms.reduce[Column](_ + _).cast(LongType)
    }
  }
}
