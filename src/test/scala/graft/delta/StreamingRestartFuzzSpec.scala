package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Streaming offset integrity under random interleavings: appends,
  * shading deletes and OPTIMIZE rewrites hit the source table while an
  * AvailableNow stream (skipChangeCommits, so change commits contribute
  * nothing) drains at random points — each drain a fresh query over the
  * same checkpoint, i.e. a RESTART. The sink must accumulate exactly
  * every appended row, exactly once, no matter where the drains land
  * relative to DML and checkpoint-cadence commits. Fixed seed. */
class StreamingRestartFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("restarted AvailableNow streams deliver every append exactly once " +
      "under random DML interleavings (seeded)") {
    val rnd = new scala.util.Random(1618033L)
    withTempDir { root =>
      val src = s"$root/src"
      val sink = s"$root/sink"
      val ckpt = s"$root/ckpt"
      var nextId = 0L
      var appended = Vector.empty[Long]
      def freshRows(n: Int): Seq[Long] = {
        val r = nextId until nextId + n
        nextId += n
        appended ++= r
        r
      }
      DeltaTable.write(freshRows(20).toDF("id").coalesce(1), src,
        configuration = Map(
          "delta.checkpointInterval" -> "4",
          "delta.enableDeletionVectors" -> "true"))
      def drain(): Unit = {
        val q = spark.readStream.format("graft-delta")
          .option("skipChangeCommits", "true").load(src)
          .writeStream.format("graft-delta")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start(sink)
        q.awaitTermination(60000)
      }
      drain() // initial snapshot
      for (step <- 1 to 16) {
        rnd.nextInt(8) match {
          case n if n <= 3 =>
            DeltaTable.write(
              freshRows(rnd.nextInt(9) + 1).toDF("id").coalesce(1), src)
          case 4 | 5 => // change commit: the stream must SKIP it
            val lo = rnd.nextLong().abs % math.max(nextId, 1L)
            DeltaTable.forPath(spark, src)
              .delete($"id" >= lo && $"id" < lo + rnd.nextInt(10) + 1)
          case 6 => // dataChange=false rewrite: contributes nothing
            DeltaTable.forPath(spark, src).compact()
          case _ => drain() // restart mid-sequence
        }
      }
      drain() // final catch-up
      val got = DeltaTable.forPath(spark, sink).toDF
        .select($"id").as[Long].collect().sorted.toSeq
      assert(got == appended.sorted,
        s"sink must hold every append exactly once: got ${got.size}, " +
          s"expected ${appended.size}; dupes=${got.diff(got.distinct).take(5)} " +
          s"missing=${appended.diff(got).take(5)}")
    }
  }
}
