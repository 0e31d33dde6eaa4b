package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered event funnels: for each entity, the earliest time every step
  * of an ordered step sequence is reached, where step k counts only
  * STRICTLY AFTER the entity reached step k-1 (the standard product
  * funnel — a click before the first view attributes nothing).
  *
  * Scale shape: each step is one type-filtered scan (the equality
  * predicate pushes to parquet) aggregated by the entity key — a
  * hash-partial shuffle whose reduce side shrinks monotonically with
  * the funnel (step k's input joins against only the entities that
  * reached k-1, a broadcast once the funnel narrows). Nothing is
  * collected; the result is one row per step-1 entity with nullable
  * reach times. Catalyst keeps the per-step plans independent, so AQE
  * can pick broadcast joins level by level as cardinalities drop. */
object Funnel {

  /** One row per entity that reached step 1:
    * (entity, step1_ts, step2_ts, ..., stepN_ts) with nulls from the
    * first step the entity never (strictly later) reached. */
  def reach(df: DataFrame, entityCol: String, tsCol: String,
            typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = df.filter(col(typeCol) === steps.head)
      .groupBy(col(entityCol)).agg(min(col(tsCol)).as("step1_ts"))
    val levels = scala.collection.mutable.Buffer(first)
    steps.drop(1).zipWithIndex.foreach { case (st, i0) =>
      val k = i0 + 2
      val prevTs = s"step${k - 1}_ts"
      val level = df.filter(col(typeCol) === st)
        .select(col(entityCol), col(tsCol).as("__ts"))
        .join(levels.last.select(col(entityCol), col(prevTs)), entityCol)
        .filter(col("__ts") > col(prevTs))
        .groupBy(col(entityCol)).agg(min(col("__ts")).as(s"step${k}_ts"))
      levels += level
    }
    // each level is exactly (entity, stepK_ts); entities keep their
    // step-1 row and gain nulls from the first unreached step
    levels.reduceLeft((a, b) => a.join(b, Seq(entityCol), "left")).toDF()
  }

  /** Funnel summary: per-step reached-entity counts plus the exact
    * summed completion lag (microseconds, step 1 → step N) over
    * completers — one row, exact integers. */
  def summary(df: DataFrame, entityCol: String, tsCol: String,
              typeCol: String, steps: Seq[String]): DataFrame = {
    val r = reach(df, entityCol, tsCol, typeCol, steps)
    val lastTs = col(s"step${steps.size}_ts")
    val counts = steps.indices.map(i =>
      count(col(s"step${i + 1}_ts")).as(s"n_step${i + 1}"))
    r.agg(counts.head, (counts.tail :+
      coalesce(sum(when(lastTs.isNotNull,
        unix_micros(lastTs) - unix_micros(col("step1_ts")))), lit(0L))
        .as("sum_lag_us")): _*)
  }
}
