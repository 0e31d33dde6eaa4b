package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cohort retention semantics: Monday-truncated UTC weeks, cohort = week
  * of first event, per-(cohort, offset) distinct actives, multi-event
  * weeks counted once. */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-01 is a Monday; weeks below are w0 = Jan 1, w1 = Jan 8,
  // w2 = Jan 15.
  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    // u1: cohort w0, active w0 (twice — counted once) and w2
    (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-04 09:00:00")),
    (1L, ts("2024-01-16 12:00:00")),
    // u2: cohort w0 (boundary: Monday 00:00 exactly), active w1
    (2L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-08 23:00:00")),
    // u3: cohort w1 only — Sunday, still w1 (Monday truncation)
    (3L, ts("2024-01-14 23:59:59"))
  ).toDF("user_id", "ts")

  test("weekly cohorts: triangle with distinct actives per offset") {
    val r = Retention.weeklyCohorts(events, "user_id", "ts")
      .select(date_format($"cohort_week", "yyyy-MM-dd").as("w"),
        $"week_offset", $"n_active")
      .as[(String, Long, Long)].collect().toSet
    assert(r == Set(
      ("2024-01-01", 0L, 2L),   // u1, u2 in their cohort week
      ("2024-01-01", 1L, 1L),   // u2 back in w1
      ("2024-01-01", 2L, 1L),   // u1 back in w2
      ("2024-01-08", 0L, 1L)    // u3's cohort week
    ), r.toString)
  }

  test("offset-0 count equals cohort size for every cohort") {
    val r = Retention.weeklyCohorts(events, "user_id", "ts")
    val zero = r.filter($"week_offset" === 0)
      .agg(sum($"n_active")).as[Long].head()
    val users = events.select($"user_id").distinct().count()
    assert(zero == users)
  }
}
