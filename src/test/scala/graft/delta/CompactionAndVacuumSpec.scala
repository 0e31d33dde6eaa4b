package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactionAndVacuumSpec extends SparkSpec {
  import spark.implicits._

  test("compact bin-packs small files without changing data") {
    withTempDir { dir =>
      (1 to 12).foreach(i =>
        DeltaTable.write(Seq((i, s"g${i % 2}")).toDF("v", "grp"), dir,
          partitionBy = if (i == 1) Seq("grp") else Nil))
      val log = DeltaLog.forTable(spark, dir)
      val before = log.update()
      assert(before.allFiles.size >= 12)
      val expected = before.toDF.as[(Int, String)].collect().toSet

      val table = DeltaTable.forPath(spark, dir)
      val v = table.compact()
      assert(v == before.version + 1)
      val after = log.update()
      // one output per partition (tiny data, 128MB target)
      assert(after.allFiles.size == 2, s"got ${after.allFiles.map(_.path)}")
      assert(after.toDF.as[(Int, String)].collect().toSet == expected)
      assert(after.allFiles.forall(!_.dataChange))
      // recorded as OPTIMIZE with metrics
      val hist = table.history().filter($"operation" === "OPTIMIZE")
      assert(hist.count() == 1)
      // time travel before the compaction still works (files not deleted)
      assert(table.asOfVersion(before.version).count() == 12)
    }
  }

  test("a stream across a compaction does not re-emit rows") {
    withTempDir { base =>
      val dir = s"$base/table"
      val dst = s"$base/dst"
      def runOnce(): Unit = {
        val q = spark.readStream.format("graft-delta").load(dir)
          .writeStream.format("graft-delta")
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(dst)
        q.awaitTermination(60000)
      }
      DeltaTable.write((1 to 6).toDF("v"), dir)
      runOnce()
      assert(DeltaTable.forPath(spark, dst).toDF.count() == 6)

      DeltaTable.forPath(spark, dir).compact()
      DeltaTable.write(Seq(7).toDF("v"), dir)
      runOnce()
      // only the genuinely new row arrives; the rewrite is invisible
      assert(DeltaTable.forPath(spark, dst).toDF.as[Int].collect().sorted.toSeq ==
        (1 to 7).toSeq)
    }
  }

  test("vacuum deletes unreferenced files after the retention window") {
    withTempDir { dir =>
      (1 to 6).foreach(i => DeltaTable.write(Seq(i).toDF("v"), dir))
      val log = DeltaLog.forTable(spark, dir)
      val table = DeltaTable.forPath(spark, dir)
      val preCompactVersion = log.update().version
      val start = 3000000000000L
      log.clock = () => start // tombstones from the compaction get ts=start
      table.compact()

      // tombstones are young: their files are protected
      assert(table.vacuum() == 0)

      // jump past the 1-week retention — protection lapses
      log.clock = () => start + 8L * 24 * 3600 * 1000
      val deleted = table.vacuum()
      assert(deleted >= 6, s"deleted only $deleted")

      // current snapshot intact; pre-compaction snapshot is gone
      DeltaLog.clearCache()
      assert(DeltaTable.forPath(spark, dir).toDF.as[Int].collect().sorted.toSeq ==
        (1 to 6).toSeq)
      intercept[Exception] {
        DeltaTable.forPath(spark, dir).asOfVersion(preCompactVersion).count()
      }
    }
  }
}
