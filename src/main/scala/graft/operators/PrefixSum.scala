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
    * `bucket` must be integral/orderable (a cheap pure expression); rows
    * keep all their columns.
    *
    * ONE lazy plan, not two actions (r15, guide §2.4): the old form
    * collected bucket totals to the driver and broadcast them back as a
    * literal map — which executed the INPUT subtree twice (once for the
    * collect, once for the window pass; exchange reuse never spans
    * separate actions) and inlined an O(buckets) literal into the plan.
    * Here the exclusive prefix is itself a window over the O(buckets)
    * totals (single-task, but over bucket-count rows — the trap this
    * operator exists to avoid applies to ROW-count windows), broadcast-
    * joined back on the bucket id; the totals aggregation and the
    * within-bucket window hash-partition by the SAME key, so Catalyst
    * reuses one exchange of the input for both. */
  def runningTotal(df: DataFrame, bucket: Column, order: Seq[Column],
                   value: Column, resultCol: String): DataFrame = {
    val tagged = df.withColumn("__bucket", bucket.cast("long"))
      .withColumn("__v", value.cast("long"))
    // exclusive prefix per bucket: Σ of all strictly-earlier buckets
    val offsets = tagged.groupBy(col("__bucket"))
      .agg(sum(col("__v")).as("__s"))
      .withColumn("__off", coalesce(
        sum(col("__s")).over(Window.orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bucket"), col("__off"))
    val w = Window.partitionBy(col("__bucket"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // LEFT join + coalesce: a NULL bucket never equi-joins, and the old
    // element_at+coalesce form kept such rows with offset 0 — an inner
    // join would silently drop them
    tagged
      .withColumn("__run", sum(col("__v")).over(w))
      .join(broadcast(offsets), Seq("__bucket"), "left")
      .withColumn(resultCol, col("__run") + coalesce(col("__off"), lit(0L)))
      .drop("__bucket", "__v", "__run", "__off")
  }
}
