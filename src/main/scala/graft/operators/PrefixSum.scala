package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global running sum — the fix for Spark's classic scale
  * trap: a running total in a GLOBAL order plans as a partition-less
  * WindowExec that funnels the whole dataset through one task.
  *
  * Two-level formulation instead: the caller names a `bucket` — any
  * expression MONOTONE in the global order (an epoch-day of the order
  * timestamp, a range bin, …) — and the running sum decomposes into
  *   running(row) = Σ (bucket totals before row's bucket)   [driver]
  *                + within-bucket running sum               [executors]
  * The bucket totals are one hash aggregation, O(buckets) rows to the
  * driver, exclusive-prefixed there and broadcast back as a literal map;
  * the within-bucket part is an ordinary partitioned window. Every stage
  * is deterministic (the bucket is a pure function of the data — no
  * range-partitioner sampling), so two runs and two engines agree
  * bit-for-bit on integer inputs.
  *
  * Scale: buckets play the role tasks do in a textbook parallel scan —
  * size them like range-join bins (≫ cores, each bucket's rows fitting
  * a task). Driver state is the bucket-total map, nothing else.
  */
object PrefixSum {

  /** Adds `resultCol` = running sum of `value` in the total order
    * (`bucket` major — monotone by contract — then `order` within it).
    * `bucket` must be integral/orderable and is evaluated twice (cheap
    * pure expression); rows keep all their columns. */
  def runningTotal(df: DataFrame, bucket: Column, order: Seq[Column],
                   value: Column, resultCol: String): DataFrame = {
    val tagged = df.withColumn("__bucket", bucket.cast("long"))
      .withColumn("__v", value.cast("long"))
    val totals = tagged.groupBy(col("__bucket"))
      .agg(sum(col("__v")).as("__s"))
      .orderBy(col("__bucket"))
      .collect()
    // exclusive prefix over the observed buckets, in bucket order
    var acc = 0L
    val offsets = totals.map { r =>
      val b = r.getLong(0); val s = r.getLong(1)
      val o = (b, acc); acc += s; o
    }.toMap
    val w = Window.partitionBy(col("__bucket"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsetCol =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(offsets), col("__bucket")), lit(0L))
    tagged
      .withColumn(resultCol, sum(col("__v")).over(w) + offsetCol)
      .drop("__bucket", "__v")
  }
}
