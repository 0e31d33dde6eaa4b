package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming funnel: strict step ordering, EXACT under out-of-order
  * arrival (watermark-buffered fold), once-only completion, and
  * randomized agreement with the batch Funnel operator. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val Steps = Seq("view", "click", "purchase")
  private val BaseMin = 1440L

  /** Feed (user, minute, type) batches; return completions as
    * (user, step minutes). */
  private def run(batches: Seq[Seq[(Long, Long, String)]],
                  delay: String = "1 hour"): Map[Long, Seq[Long]] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val events = input.toDS()
      .select($"_1".as("user_id"),
        timestamp_millis(($"_2" + BaseMin) * 60000L).as("ts"),
        $"_3".as("event_type"))
      .as[StepEvent]
    val out = StreamingFunnel.completions(events, Steps, delay)
    val q = out.writeStream.format("memory")
      .queryName("funnel_sink").outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      input.addData((999L, 100000L, "view")); q.processAllAvailable()
      input.addData((999L, 200000L, "view")); q.processAllAvailable()
      spark.table("funnel_sink")
        .filter($"user_id" =!= 999L)
        .select($"user_id", transform($"step_ts",
          c => (unix_micros(c) / 60000000L - BaseMin).cast("long")))
        .as[(Long, Seq[Long])].collect().toMap
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS funnel_sink")
    }
  }

  test("in-order completion, strict ties, non-completers emit nothing") {
    val got = run(Seq(
      // u1 completes; u2's click at EXACTLY the view minute must not
      // count (strict >) but its later click does — still no purchase;
      // u3 purchase-before-view never completes
      Seq((1L, 10L, "view"), (1L, 20L, "click"), (2L, 10L, "view"), (2L, 10L, "click")),
      Seq((1L, 30L, "purchase"), (2L, 40L, "click"), (3L, 5L, "purchase"), (3L, 6L, "view"))))
    assert(got == Map(1L -> Seq(10L, 20L, 30L)), got.toString)
  }

  test("out-of-order arrival folds exactly: late view unlocks the funnel") {
    // the purchase and click arrive FIRST; the view arrives in a later
    // micro-batch (inside the watermark). A naive in-arrival-order fold
    // would never complete; the watermark-buffered fold must yield the
    // batch answer (10, 20, 30).
    val got = run(Seq(
      Seq((5L, 30L, "purchase"), (5L, 20L, "click")),
      Seq((5L, 10L, "view"))))
    assert(got == Map(5L -> Seq(10L, 20L, 30L)), got.toString)
  }

  test("completion is emitted exactly once; later events are ignored") {
    val got = run(Seq(
      Seq((6L, 10L, "view"), (6L, 20L, "click"), (6L, 30L, "purchase")),
      Seq((6L, 200L, "view"), (6L, 300L, "click"), (6L, 400L, "purchase"))))
    assert(got == Map(6L -> Seq(10L, 20L, 30L)), got.toString)
  }

  test("randomized agreement with the batch Funnel operator") {
    val rnd = new scala.util.Random(20260816L)
    val types = Seq("view", "click", "purchase", "noise")
    val events = (1 to 400).map { _ =>
      (rnd.nextInt(40).toLong + 1L, rnd.nextInt(500).toLong + 1L,
        types(rnd.nextInt(types.length)))
    }
    // random 3-batch split, shuffled inside each batch (out of order);
    // allowed lateness wider than the whole event range so the shuffle
    // can never make an event genuinely late — equivalence must be exact
    val shuffled = rnd.shuffle(events)
    val batches = shuffled.grouped((shuffled.size + 2) / 3).toSeq
    val got = run(batches, delay = "700 minutes")

    val batchDf = events
      .toDF("user_id", "min", "event_type")
      .select($"user_id", timestamp_millis(($"min" + BaseMin) * 60000L).as("ts"),
        $"event_type")
    val expected = graft.operators.Funnel
      .reach(batchDf, "user_id", "ts", "event_type", Steps)
      .filter($"step3_ts".isNotNull)
      .select($"user_id",
        array($"step1_ts", $"step2_ts", $"step3_ts").as("a"))
      .select($"user_id", transform($"a",
        c => (unix_micros(c) / 60000000L - BaseMin).cast("long")))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got == expected, s"streaming $got\nbatch $expected")
  }
}
