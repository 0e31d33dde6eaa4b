package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The partial top-k Aggregator composed with a STREAMING windowed
  * aggregation: the typed buffer must round-trip the state store across
  * micro-batches (partial merges land in different batches), and the
  * window emits its final top-k exactly once on watermark close. */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  test("windowed streaming top-k merges state across batches, emits on close") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double, Long)] // (minute, score, id)
    val top2 = graft.operators.TopK.topK(2)
    val agg = input.toDF().toDF("min", "score", "id")
      .withColumn("ts", timestamp_millis(($"min" + 1440L) * 60000L))
      .withWatermark("ts", "0 seconds")
      .groupBy(window($"ts", "1 hour"))
      .agg(top2($"score", $"id", lit(0L)).as("top"))
      .select(($"window.start".cast("long") / 60 - 1440L).cast("long").as("w"),
        transform($"top", e => e.getField("_2")).as("ids"))
    val q = agg.writeStream.format("memory")
      .queryName("topk_sink").outputMode("append").start()
    try {
      // window [0,60): candidates arrive split across two batches — the
      // partial buffers must merge through the state store
      input.addData((10L, 5.0, 101L), (20L, 9.0, 102L))
      q.processAllAvailable()
      input.addData((30L, 7.0, 103L), (40L, 1.0, 104L))
      q.processAllAvailable()
      // nothing may emit before the watermark passes the window end
      assert(spark.table("topk_sink").isEmpty)
      // events in [120,180) push the watermark past 60 → first window closes
      input.addData((130L, 4.0, 201L))
      q.processAllAvailable()
      input.addData((260L, 2.0, 301L))
      q.processAllAvailable()
      val got = spark.table("topk_sink")
        .as[(Long, Seq[Long])].collect().toMap
      assert(got(0L) == Seq(102L, 103L), got.toString) // 9.0 then 7.0
      assert(got(120L) == Seq(201L), got.toString)
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS topk_sink")
    }
  }
}
