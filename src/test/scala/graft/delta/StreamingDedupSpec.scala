package graft.delta

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Watermark-bounded streaming deduplication feeding the Delta sink:
  * Spark's dropDuplicatesWithinWatermark holds per-key state only
  * inside the watermark horizon (the bounded-state contract a 100 TB
  * stream needs — unbounded dropDuplicates state grows forever), and
  * the sink must see each key once across micro-batches. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("cross-batch duplicates within the watermark reach the sink once") {
    withTempDir { base =>
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val deduped = input.toDF().toDF("sec", "key")
        .withColumn("ts", timestamp_seconds($"sec"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("key")
      val q = deduped.writeStream.format("graft-delta")
        .option("checkpointLocation", s"$base/ckpt")
        .start(s"$base/table")
      try {
        input.addData((100L, "a"), (101L, "b"), (102L, "a"))
        q.processAllAvailable()
        // a second batch re-sends "a" well inside the watermark: state
        // must swallow it; "c" is new
        input.addData((103L, "a"), (104L, "c"))
        q.processAllAvailable()
        val keys = DeltaTable.forPath(spark, s"$base/table").toDF
          .select($"key").as[String].collect().sorted
        assert(keys.toSeq == Seq("a", "b", "c"))
      } finally q.stop()
    }
  }
}
