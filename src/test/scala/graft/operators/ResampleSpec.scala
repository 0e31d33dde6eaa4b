package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Resample + forward fill: per-period last observation (ts then tie
  * ordering), gap fill across silent periods, span bounded per key. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Long, m: Long = 0) = new Timestamp((h * 3600 + m * 60) * 1000)

  test("hourly grid: last-per-period, forward fill, per-key span") {
    val df = Seq(
      // k1: hour 0 has two observations (minute 30 wins), then silence
      // until hour 3 — hours 1 and 2 must carry 2.0 forward
      (1L, ts(0, 10), 1L, 1.0), (1L, ts(0, 30), 2L, 2.0),
      (1L, ts(3, 0), 3L, 3.0),
      // k2: single observation — a single-row grid
      (2L, ts(5, 0), 4L, 9.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val r = Temporal.resampleFfill(df, "user_id", "ts", "event_id", "value", "hour")
      .select($"user_id", (unix_seconds($"period") / 3600L).cast("long"), $"value")
      .as[(Long, Long, Double)].collect().toSet
    assert(r == Set(
      (1L, 0L, 2.0), (1L, 1L, 2.0), (1L, 2L, 2.0), (1L, 3L, 3.0),
      (2L, 5L, 9.0)), r.toString)
  }

  test("same-timestamp ties resolve by the tie column, descending") {
    val df = Seq(
      (7L, ts(1, 0), 10L, 5.0), (7L, ts(1, 0), 11L, 6.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val r = Temporal.resampleFfill(df, "user_id", "ts", "event_id", "value", "hour")
      .select($"value").as[Double].collect().toSeq
    assert(r == Seq(6.0), r.toString)
  }
}
