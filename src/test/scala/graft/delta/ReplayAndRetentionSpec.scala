package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ReplayAndRetentionSpec extends SparkSpec {
  import spark.implicits._

  test("distributed replay matches in-memory replay across checkpoint, deletes and re-adds") {
    withTempDir { dir =>
      DeltaTable.write((1 to 20).map(i => (i, s"g${i % 4}")).toDF("v", "grp"),
        dir, partitionBy = Seq("grp"),
        configuration = Map("delta.checkpointInterval" -> "3"))
      (1 to 4).foreach { i =>
        DeltaTable.write(Seq((100 + i, s"g${i % 4}")).toDF("v", "grp"), dir)
      }
      DeltaTable.forPath(spark, dir).deleteWhere($"grp" === "g1")
      DeltaTable.write(Seq((200, "g1")).toDF("v", "grp"), dir)

      val snapshot = DeltaLog.forTable(spark, dir).update()
      val inMemory = snapshot.allFiles.map(f => (f.path, f.size)).toSet
      val distributed = snapshot.allFilesDistributed.collect()
        .map(f => (f.path, f.size)).toSet
      assert(distributed == inMemory)
      assert(distributed.nonEmpty)
    }
  }

  test("log cleanup deletes pre-checkpoint commits past retention (manual clock)") {
    withTempDir { dir =>
      val start = 1000000000000L
      var now = start
      DeltaTable.write((1 to 5).toDF("v"), dir,
        configuration = Map(
          "delta.checkpointInterval" -> "2",
          "delta.logRetentionDuration" -> "interval 30 days"))
      val log = DeltaLog.forTable(spark, dir)
      log.clock = () => now
      (1 to 4).foreach(i => DeltaTable.write(Seq(i).toDF("v"), dir))
      // commits 0..4 exist; checkpoints at 2 and 4
      val fs = log.logPath.getFileSystem(log.hadoopConf)
      assert(fs.exists(FileNames.deltaFile(log.logPath, 0)))
      // pin every log file's mtime to the manual clock (the reference's
      // retention tests drive a ManualClock the same way)
      fs.listStatus(log.logPath).foreach(f =>
        fs.setTimes(f.getPath, start, start))

      // nothing is old enough yet
      assert(log.cleanUpExpiredLogs() == 0)

      // jump 40 days: files modified "now" are older than the cutoff
      now = start + 40L * 24 * 3600 * 1000
      val deleted = log.cleanUpExpiredLogs()
      assert(deleted > 0)
      assert(!fs.exists(FileNames.deltaFile(log.logPath, 0)))
      // the table still reconstructs from the checkpoint
      DeltaLog.clearCache()
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 9)
      // ...but time travel before the checkpoint is gone
      intercept[Exception] {
        DeltaTable.forPath(spark, dir).asOfVersion(0).count()
      }
      // history() survives cleanup: it returns the commits that still
      // exist instead of throwing FileNotFoundException on the deleted tail
      val hist = DeltaLog.forTable(spark, dir).history()
      assert(hist.nonEmpty)
      val versions = hist.flatMap(_.version)
      assert(versions == versions.sorted.reverse)
      assert(versions.min > 0) // the expired tail is absent, not erroring
    }
  }

  test("tombstones expire from state after the retention window") {
    withTempDir { dir =>
      DeltaTable.write((1 to 10).map(i => (i, s"g${i % 2}")).toDF("v", "grp"),
        dir, partitionBy = Seq("grp"))
      val log = DeltaLog.forTable(spark, dir)
      val start = 2000000000000L
      log.clock = () => start
      DeltaTable.forPath(spark, dir).deleteWhere($"grp" === "g0")
      assert(log.update().tombstones.nonEmpty)
      // jump past the 1-week default tombstone retention
      log.clock = () => start + 8L * 24 * 3600 * 1000
      DeltaTable.write(Seq((99, "g0")).toDF("v", "grp"), dir) // forces refresh
      assert(log.update().tombstones.isEmpty)
    }
  }

  test("spark.sql over the delta format (host-engine SQL surface)") {
    withTempDir { dir =>
      DeltaTable.write(
        (1 to 100).map(i => (i.toLong, s"c${i % 10}", i * 1.5)).toDF("id", "cat", "amt"),
        dir, partitionBy = Seq("cat"))
      spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW sales
                    USING `graft-delta` OPTIONS (path '$dir')""")
      val top = spark.sql("""
        SELECT cat, COUNT(*) AS n, SUM(CAST(amt AS DECIMAL(12,2))) AS total
        FROM sales WHERE cat IN ('c1','c2') GROUP BY cat ORDER BY cat""")
        .collect()
      assert(top.length == 2)
      assert(top.map(_.getAs[Long]("n")).toSeq == Seq(10L, 10L))
      spark.catalog.dropTempView("sales")
    }
  }
}
