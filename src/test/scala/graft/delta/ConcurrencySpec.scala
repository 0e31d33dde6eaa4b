package graft.delta

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  test("racing blind appends all land; versions stay contiguous") {
    withTempDir { dir =>
      DeltaTable.write(Seq((0, "init")).toDF("v", "who"), dir)
      val threads = 4
      val perThread = 3
      val pool = Executors.newFixedThreadPool(threads)
      val start = new CountDownLatch(1)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      (0 until threads).foreach { t =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            start.await()
            try {
              (0 until perThread).foreach { i =>
                DeltaTable.write(
                  Seq((t * 100 + i, s"t$t")).toDF("v", "who"), dir)
              }
            } catch { case e: Throwable => failures.add(e) }
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS))
      assert(failures.isEmpty, s"concurrent appends failed: ${failures.peek()}")

      DeltaLog.clearCache()
      val log = DeltaLog.forTable(spark, dir)
      val snapshot = log.update()
      assert(snapshot.version == threads * perThread) // 0 + 12 appends
      assert(snapshot.toDF.count() == 1 + threads * perThread)
      // every version is a readable commit (no gaps, no clobbers)
      (0L to snapshot.version).foreach { v =>
        assert(log.getCommitInfoAt(v).version.contains(v))
      }
    }
  }

  test("appends race OPTIMIZE without conflict or data loss") {
    withTempDir { dir =>
      (1 to 4).foreach(i => DeltaTable.write(Seq(i).toDF("v"), dir))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        // OPTIMIZE commits dataChange=false under SnapshotIsolation; a
        // concurrent blind append must not conflict with it (and vice
        // versa) — both land, possibly after a retry
        val compactor = pool.submit(new Runnable {
          def run(): Unit =
            (1 to 3).foreach(_ => DeltaTable.forPath(spark, dir).compact())
        })
        val appender = pool.submit(new Runnable {
          def run(): Unit = (5 to 10).foreach(i =>
            DeltaTable.write(Seq(i).toDF("v"), dir))
        })
        compactor.get(120, java.util.concurrent.TimeUnit.SECONDS)
        appender.get(120, java.util.concurrent.TimeUnit.SECONDS)
      } finally pool.shutdown()
      assert(DeltaTable.forPath(spark, dir).toDF
        .as[Int].collect().sorted.toSeq == (1 to 10).toSeq)
    }
  }

  test("operation metrics are recorded for writes and deletes") {
    withTempDir { dir =>
      DeltaTable.write(
        (1 to 30).map(i => (i, s"g${i % 3}")).toDF("v", "grp"),
        dir, partitionBy = Seq("grp"))
      DeltaTable.forPath(spark, dir).deleteWhere($"grp" === "g1")

      val history = DeltaTable.forPath(spark, dir).history()
      val byOp = history.select($"operation", $"operationMetrics")
        .as[(String, Map[String, String])].collect().toMap
      val log = DeltaLog.forTable(spark, dir)
      val survivors = log.update().allFiles.size
      val removed = log.update().tombstones.size
      val create = byOp("CREATE TABLE")
      assert(create("numFiles").toInt == survivors + removed)
      assert(create("numOutputRows").toLong == 30)
      assert(create("numOutputBytes").toLong > 0)
      val delete = byOp("DELETE")
      assert(delete("numRemovedFiles").toInt == removed)
      assert(delete("numRemovedBytes").toLong > 0)
    }
  }

  test("streaming source honors startingTimestamp") {
    withTempDir { dir =>
      val log0 = {
        DeltaTable.write(Seq(1, 2).toDF("v"), dir)
        DeltaLog.forTable(spark, dir)
      }
      // pin distinct mtimes so the timestamp cut is deterministic
      val fs = log0.logPath.getFileSystem(log0.hadoopConf)
      DeltaTable.write(Seq(3, 4).toDF("v"), dir)
      DeltaTable.write(Seq(5, 6).toDF("v"), dir)
      val base = 1700000000000L
      (0L to 2L).foreach { v =>
        fs.setTimes(FileNames.deltaFile(log0.logPath, v), base + v * 60000, base + v * 60000)
      }
      // cut between version 1 and 2 → only version 2's rows stream
      val cut = new java.sql.Timestamp(base + 90000).toString
      val q = spark.readStream.format("graft-delta")
        .option("startingTimestamp", cut).load(dir)
        .writeStream.format("memory").queryName("from_ts")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      val got = spark.table("from_ts").as[Int].collect().sorted.toSeq
      assert(got == Seq(5, 6))
    }
  }
}
