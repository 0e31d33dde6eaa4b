package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention: bucket entities by the period of their FIRST event
  * (the cohort), then count how many of each cohort are active again
  * k periods later — the standard retention triangle.
  *
  * Scale shape: ONE scan of the event table. The per-(entity, period)
  * de-duplication, the per-entity cohort derivation, and the final
  * (cohort, offset) rollup are all hash-partial aggregations over keys
  * the data is already being exchanged on — activity and cohorts share
  * the entity-key partitioning, so Catalyst reuses the exchange for the
  * self-join, and the final rollup's key space is O(periods²), tiny at
  * any data scale. No windows, no driver materialization; a 100 TB
  * event log reduces to |entities × active periods| after the first
  * partial aggregate, map-side.
  */
object Retention {

  /** One row per (cohort_period, period_offset): cohort_period is the
    * UTC week (Monday-truncated) of the entity's first event,
    * period_offset counts weeks after it (0 = the cohort week itself,
    * whose n_active is the cohort size), n_active = distinct entities
    * from that cohort with any event in that week. */
  def weeklyCohorts(df: DataFrame, entityCol: String, tsCol: String): DataFrame = {
    val activity = df
      .select(col(entityCol).as("__e"),
        date_trunc("week", col(tsCol)).as("__week"))
      .distinct()
    val cohorts = activity
      .groupBy(col("__e"))
      .agg(min(col("__week")).as("cohort_week"))
    activity.join(cohorts, "__e")
      .groupBy(col("cohort_week"),
        ((unix_seconds(col("__week")) - unix_seconds(col("cohort_week"))) / 604800L)
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }
}
