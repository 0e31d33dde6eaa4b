package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Streaming × deletion vectors: what a continuous reader sees when a
  * SHADING commit (remove + re-add of the same file with a DV,
  * dataChange=true) arrives mid-stream, under each of the three change
  * policies, plus the CDF stream over DV DML. Batch × DV and CDF × DV
  * have their own specs; this pins the streaming face. */
class StreamingDvShadeSpec extends SparkSpec {
  import spark.implicits._

  /** One-file DV-enabled table with rows 1..10. */
  private def dvTable(base: String): String = {
    val table = s"$base/table"
    DeltaTable.write(
      (1 to 10).map(i => (i, i * 1.0)).toDF("id", "price").coalesce(1),
      table,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    table
  }

  test("default: a mid-stream shading commit fails naming the remedies") {
    withTempDir { base =>
      val table = dvTable(base)
      val ckpt = s"$base/ckpt"
      val dst = s"$base/dst"
      val q1 = spark.readStream.format("graft-delta").load(table)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(dst)
      q1.awaitTermination(60000)
      assert(DeltaTable.forPath(spark, dst).toDF.count() == 10)

      // DV delete: remove + re-add same file with a deletion vector
      DeltaTable.forPath(spark, table).delete($"id" <= 2)
      val snap = DeltaLog.forTable(spark, table).update()
      assert(snap.allFiles.exists(_.deletionVector.isDefined),
        "precondition: the delete must shade, not rewrite")

      val q2 = spark.readStream.format("graft-delta").load(table)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(dst)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.awaitTermination()
      }
      val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
      assert(msg.contains("ignoreChanges") && msg.contains("skipChangeCommits"),
        s"failure must name the remedies: $msg")
    }
  }

  test("ignoreChanges: the shaded file re-emits its SURVIVING rows only") {
    withTempDir { base =>
      val table = dvTable(base)
      val ckpt = s"$base/ckpt"
      val dst = s"$base/dst"
      def run(): Unit = {
        val q = spark.readStream.format("graft-delta")
          .option("ignoreChanges", "true").load(table)
          .writeStream.format("graft-delta")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start(dst)
        q.awaitTermination(60000)
      }
      run()
      DeltaTable.forPath(spark, table).delete($"id" <= 2)
      run()
      val counts = DeltaTable.forPath(spark, dst).toDF
        .groupBy($"id").agg(count(lit(1)).as("n"))
        .as[(Int, Long)].collect().toMap
      // deleted rows appear ONLY from the initial snapshot — the
      // re-emission reads the file THROUGH its deletion vector
      assert(counts(1) == 1 && counts(2) == 1,
        s"deleted rows must not re-emit: $counts")
      // surviving rows re-emit once (the documented duplicate-downstream
      // contract of ignoreChanges)
      assert((3 to 10).forall(counts(_) == 2),
        s"surviving rows re-emit exactly once: $counts")
    }
  }

  test("skipChangeCommits: the shading commit contributes nothing; appends flow") {
    withTempDir { base =>
      val table = dvTable(base)
      val ckpt = s"$base/ckpt"
      val dst = s"$base/dst"
      def run(): Unit = {
        val q = spark.readStream.format("graft-delta")
          .option("skipChangeCommits", "true").load(table)
          .writeStream.format("graft-delta")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start(dst)
        q.awaitTermination(60000)
      }
      run()
      DeltaTable.forPath(spark, table).delete($"id" <= 2)
      DeltaTable.write(Seq((11, 11.0)).toDF("id", "price"), table)
      run()
      val out = DeltaTable.forPath(spark, dst).toDF
        .select($"id").as[Int].collect().sorted.toSeq
      // initial 1..10 stay as streamed (the skip never retracts), the
      // shading commit is invisible, the append lands once
      assert(out == (1 to 11), s"got $out")
    }
  }

  test("readChangeFeed stream emits the DV delete as delete rows") {
    withTempDir { base =>
      val table = s"$base/table"
      DeltaTable.write(
        (1 to 6).map(i => (i, i * 1.0)).toDF("id", "price").coalesce(1),
        table,
        configuration = Map(
          "delta.enableDeletionVectors" -> "true",
          "delta.enableChangeDataFeed" -> "true"))
      DeltaTable.forPath(spark, table).delete($"id" === 4 || $"id" === 5)
      val q = spark.readStream.format("graft-delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load(table)
        .writeStream.format("memory").queryName("dv_cdf")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      val changes = spark.table("dv_cdf")
        .select($"id", col(write.CdcWriter.ChangeTypeCol), $"_commit_version")
        .as[(Int, String, Long)].collect().toSet
      val inserts = (1 to 6).map(i => (i, "insert", 0L)).toSet
      assert(changes == inserts ++ Set((4, "delete", 1L), (5, "delete", 1L)),
        changes.toString)
    }
  }
}
