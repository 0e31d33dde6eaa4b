package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming sessionization (flatMapGroupsWithState, event-time timeout)
  * must emit exactly the sessions the batch gap-rule produces: strict
  * `gap > 30 min` split, watermark-driven close, out-of-order merge
  * inside the watermark, exactly-once Append emission across batches. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val GapUs = 1800L * 1000000L // 30 min
  // day-1 base: an event at exactly epoch 0 sits AT the stream's initial
  // watermark and Spark's late-row filter drops it — shift all test
  // minutes off the origin and subtract the base on readback
  private val BaseMin = 1440L

  /** Run events through the streaming sessionizer in the given batches,
    * returning every ClosedSession the sink saw. */
  private def run(batches: Seq[Seq[(Long, Long)]],
                  delay: String = "1 hour"): Set[(Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val events = input.toDS()
      .select($"_1".as("user_id"),
        timestamp_millis(($"_2" + BaseMin) * 60000L).as("ts"))
      .as[SessionEvent]
    val sessions = Sessionize.sessions(events, GapUs, delay)
    val q = sessions.writeStream.format("memory")
      .queryName("sessionize_sink").outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // a far-future flush event (throwaway user) drives the watermark
      // past every real deadline so open sessions time out and emit
      input.addData((999L, 100000L)); q.processAllAvailable()
      input.addData((999L, 200000L)); q.processAllAvailable()
      spark.table("sessionize_sink")
        .filter($"user_id" =!= 999L)
        .select($"user_id",
          unix_micros($"session_start") / 60000000L - BaseMin,
          unix_micros($"session_end") / 60000000L - BaseMin, $"n_events")
        .as[(Long, Double, Double, Long)].collect()
        .map(r => (r._1, r._2.toLong, r._3.toLong, r._4)).toSet
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS sessionize_sink")
    }
  }

  test("gap rule matches the batch sessionizer, in-order stream") {
    // u1: events at 0,10,20 | gap | 60,70 — two sessions (strict >30 split)
    // u2: single event     — one 1-event session
    // u3: events exactly 30 min apart — ONE session (strict >)
    val got = run(Seq(
      Seq((1L, 0L), (1L, 10L), (2L, 5L)),
      Seq((1L, 20L), (3L, 0L), (3L, 30L)),
      Seq((1L, 60L), (1L, 70L))))
    assert(got == Set(
      (1L, 0L, 20L, 3L), (1L, 60L, 70L, 2L),
      (2L, 5L, 5L, 1L),
      (3L, 0L, 30L, 2L)), got.toString)
  }

  test("out-of-order arrival merges intervals and bridges them") {
    // batch 1 delivers minute 0 and minute 50 (two provisional sessions);
    // batch 2 delivers minute 25 — within gap of BOTH — they must fuse
    // into one 3-event session. The watermark stays at 50 until the
    // flush, so nothing closed prematurely.
    val got = run(Seq(
      Seq((7L, 0L), (7L, 50L)),
      Seq((7L, 25L))))
    assert(got == Set((7L, 0L, 50L, 3L)), got.toString)
  }

  test("randomized agreement with the batch gap rule across shuffled batches") {
    val rnd = new scala.util.Random(815L)
    val events = (1 to 300).map(_ =>
      (rnd.nextInt(30).toLong + 1L, rnd.nextInt(500).toLong + 1L))
    val shuffled = rnd.shuffle(events)
    val batches = shuffled.grouped((shuffled.size + 2) / 3).toSeq
    val got = run(batches, delay = "700 minutes")

    // brute-force the gap rule per user: sort, split on gap > 30 min
    val expected = events.groupBy(_._1).flatMap { case (u, es) =>
      val ts = es.map(_._2).sorted
      val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
        if (t - acc.head.head <= 30L) (t :: acc.head) :: acc.tail
        else List(t) :: acc
      }
      sessions.map(s => (u, s.min, s.max, s.length.toLong))
    }.toSet
    assert(got == expected, s"streaming ${got.size} vs batch ${expected.size}")
  }

  test("state bridges a stop/restart from the checkpoint, Delta sink exactly-once") {
    withTempDir { base =>
      implicit val sqlCtx = spark.sqlContext
      def start(input: MemoryStream[(Long, Long)]) = {
        val events = input.toDS()
          .select($"_1".as("user_id"),
            timestamp_millis(($"_2" + BaseMin) * 60000L).as("ts"))
          .as[SessionEvent]
        Sessionize.sessions(events, GapUs, "1 hour")
          .writeStream.format("graft-delta")
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append").start(s"$base/sessions")
      }
      // ONE stream instance across both runs: the checkpoint tracks its
      // offsets, so the restarted query resumes exactly after batch 1
      val in = MemoryStream[(Long, Long)]
      val q1 = start(in)
      try {
        in.addData((1L, 10L), (1L, 20L)); q1.processAllAvailable()
      } finally q1.stop()
      // restart: the open (10..20) interval must come back from the state
      // store and FUSE with minute 30 — not restart as a fresh session
      val q2 = start(in)
      try {
        in.addData((1L, 30L), (1L, 120L)); q2.processAllAvailable()
        in.addData((999L, 10000L)); q2.processAllAvailable()
        in.addData((999L, 20000L)); q2.processAllAvailable()
        val got = graft.delta.DeltaTable.forPath(spark, s"$base/sessions").toDF
          .filter($"user_id" =!= 999L)
          .select($"user_id",
            unix_micros($"session_start") / 60000000L - BaseMin,
            unix_micros($"session_end") / 60000000L - BaseMin, $"n_events")
          .as[(Long, Double, Double, Long)].collect()
          .map(r => (r._1, r._2.toLong, r._3.toLong, r._4)).toList.sorted
        assert(got == List((1L, 10L, 30L, 3L), (1L, 120L, 120L, 1L)), got.toString)
      } finally q2.stop()
    }
  }

  test("watermark close emits each session exactly once across batches") {
    // session A (minutes 0..10) closes only once the watermark passes
    // 10+30; later batches for the same user open a NEW session and must
    // not re-emit A
    val got = run(Seq(
      Seq((4L, 0L), (4L, 10L)),
      Seq((4L, 100L)),
      Seq((4L, 110L), (4L, 200L))))
    assert(got == Set(
      (4L, 0L, 10L, 2L), (4L, 100L, 110L, 2L), (4L, 200L, 200L, 1L)),
      got.toString)
  }
}
