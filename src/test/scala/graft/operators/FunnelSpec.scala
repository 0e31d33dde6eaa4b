package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ordered funnel semantics: strict step ordering (a click at or before
  * the first view attributes nothing), per-entity earliest reach times,
  * out-of-order input, and exact summary integers. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  private val events = Seq(
    // u1 completes in order (with a later, irrelevant repeat view)
    (1L, ts(10), "view"), (1L, ts(20), "click"), (1L, ts(30), "purchase"),
    (1L, ts(25), "view"),
    // u2: click BEFORE the first view — step 2 never reached even
    // though a click exists; the later click counts
    (2L, ts(5), "click"), (2L, ts(10), "view"), (2L, ts(40), "click"),
    // u3: click at EXACTLY the view's ts — strict > rejects it
    (3L, ts(10), "view"), (3L, ts(10), "click"),
    // u4: view only
    (4L, ts(7), "view"),
    // u5: no view at all — not in the funnel, purchases or not
    (5L, ts(1), "click"), (5L, ts(2), "purchase")
  ).toDF("user_id", "ts", "event_type")

  test("reach: strict ordering, earliest times, nullable tail") {
    val r = Funnel.reach(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .orderBy($"user_id")
      .select($"user_id", unix_micros($"step1_ts"),
        unix_micros($"step2_ts"), unix_micros($"step3_ts"))
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    def us(s: Long) = Some(s * 1000000L)
    assert(r == Seq(
      (1L, us(10), us(20), us(30)),
      (2L, us(10), us(40), None),
      (3L, us(10), None, None),
      (4L, us(7), None, None)), r.toString)
  }

  test("summary: exact counts and completion lag") {
    val s = Funnel.summary(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Long, Long, Long, Long)].head()
    // completers: only u1, lag 30-10 = 20 s
    assert(s == ((4L, 2L, 1L, 20L * 1000000L)), s.toString)
  }
}
