package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned point-in-interval join: Spark plans a raw
  * `p BETWEEN s AND e` join as BroadcastNestedLoop (or a cartesian) —
  * O(points x intervals) comparisons and a single-task disaster at
  * scale. Binning makes it an EQUI-join: each interval explodes to the
  * fixed-width bins it covers, each point computes its one bin, the
  * join runs hash/sort-merge on the bin key and the exact BETWEEN
  * re-checks as a residual. A (point, interval) pair can only meet in
  * the POINT's bin, so no dedup is needed. Shuffle volume is
  * O(points + intervals x avg_span/binWidth): pick binWidth near the
  * median interval length.
  */
object RangeJoin {

  /** Both joins reference each side's columns by bare name in the
    * residual filter, and the output carries both sides' columns — a
    * shared name would fail deep in analysis with an ambiguous-reference
    * error (or silently resolve wrong). Fail up front with the fix. */
  private def requireDisjointColumns(left: DataFrame, right: DataFrame): Unit = {
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"Both join inputs carry column(s) ${shared.mkString(", ")}; rename " +
        "one side (withColumnRenamed) so every output column is unambiguous")
  }

  /** Interval-overlap join: pairs (l, r) with
    * `l.start <= r.end AND r.start <= l.end`, through the same binning.
    * Unlike the point case, two intervals can SHARE many bins — the
    * classic fix emits a surviving pair only from its CANONICAL bin (the
    * bin of `max(l.start, r.start)`, which every overlapping pair covers
    * on both sides exactly once), so no distinct pass is needed and the
    * join output is exact without a dedup shuffle. */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      binWidth: Long,
                      maxBinsPerInterval: Int = 10000): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireDisjointColumns(left, right)
    def binned(df: DataFrame, s: String, e: String): DataFrame = {
      val spans = df
        .withColumn("__b0", floor(col(s).cast("long") / binWidth))
        .withColumn("__b1", floor(col(e).cast("long") / binWidth))
      spans.withColumn("__bin",
        explode(when(col("__b1") - col("__b0") < maxBinsPerInterval,
            sequence(col("__b0"), col("__b1")))
          .otherwise(raise_error(concat(lit(
            s"interval spans more than $maxBinsPerInterval bins of " +
              s"width $binWidth; raise binWidth or cap the interval: "),
            col(s).cast("string"), lit(".."), col(e).cast("string"))))))
        .drop("__b0", "__b1")
    }
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), Seq("__bin"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // canonical-bin guard: keep the pair only where it first overlaps
      .filter(col("__bin") ===
        floor(greatest(col(lStart), col(rStart)).cast("long") / binWidth))
      .drop("__bin")
  }

  /** Join `points` (numeric `pointCol`) to `intervals`
    * ([startCol, endCol] inclusive): the result carries both sides'
    * columns for every point inside an interval. `maxBinsPerInterval`
    * bounds the blow-up of one degenerate giant interval (such rows are
    * rejected loudly rather than silently exploding the shuffle). */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String,
                      endCol: String, binWidth: Long,
                      maxBinsPerInterval: Int = 10000): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireDisjointColumns(points, intervals)
    val p = points.withColumn("__bin",
      floor(col(pointCol).cast("long") / binWidth))
    val spans = intervals
      .withColumn("__b0", floor(col(startCol).cast("long") / binWidth))
      .withColumn("__b1", floor(col(endCol).cast("long") / binWidth))
    // loud guard, evaluated per row inside the explode (no extra pass)
    val guarded = spans.withColumn("__bin",
      explode(when(col("__b1") - col("__b0") < maxBinsPerInterval,
          sequence(col("__b0"), col("__b1")))
        .otherwise(raise_error(concat(lit(
          s"interval spans more than $maxBinsPerInterval bins of width " +
            s"$binWidth; raise binWidth or cap the interval: "),
          col(startCol).cast("string"), lit(".."),
          col(endCol).cast("string"))))))
      .drop("__b0", "__b1")
    p.join(guarded, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) &&
        col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
