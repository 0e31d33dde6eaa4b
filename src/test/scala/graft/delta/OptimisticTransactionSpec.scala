package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.delta.txn._

class OptimisticTransactionSpec extends SparkSpec {
  import spark.implicits._

  private def createPartitioned(dir: String): Unit =
    DeltaTable.write(
      (0 until 20).map(i => (i.toLong, s"g${i % 2}")).toDF("id", "grp"),
      dir, partitionBy = Seq("grp"))

  private def add(grp: String, name: String) =
    AddFile(name, Map("grp" -> grp), 1L, 1L, dataChange = true)

  test("blind appends never conflict") {
    withTempDir { dir =>
      createPartitioned(dir)
      val log = DeltaLog.forTable(spark, dir)
      val t1 = log.startTransaction()
      val t2 = log.startTransaction()
      t1.commit(Seq(add("g0", "a.parquet")), DeltaOperations.Write)
      // t2 lost the race but is a blind append → retried and committed
      val v = t2.commit(Seq(add("g1", "b.parquet")), DeltaOperations.Write)
      assert(v == 2)
    }
  }

  test("concurrent append into a read partition conflicts") {
    withTempDir { dir =>
      createPartitioned(dir)
      val log = DeltaLog.forTable(spark, dir)
      val t1 = log.startTransaction()
      val t2 = log.startTransaction()
      t2.markFilesAsRead(col("grp") === "g0")
      t1.commit(Seq(add("g0", "a.parquet")), DeltaOperations.Write)
      intercept[ConcurrentAppendException] {
        t2.commit(Seq(add("g0", "b.parquet")), DeltaOperations.Write)
      }
    }
  }

  test("path-level read set (FSCK narrowing): unrelated appends commute, " +
      "re-add or remove of a read path conflicts") {
    withTempDir { dir =>
      createPartitioned(dir)
      val log = DeltaLog.forTable(spark, dir)
      val victim = log.update().allFiles.map(_.path).sorted.head

      // 1. liveness: a winning UNRELATED append must NOT abort a txn
      //    whose read set is just the victim path (r10 readWholeTable()
      //    made any busy table starve FSCK)
      val t1 = log.startTransaction()
      t1.markPathsAsRead(Seq(victim))
      log.startTransaction()
        .commit(Seq(add("g1", "unrelated.parquet")), DeltaOperations.Write)
      val v1 = t1.commit(
        Seq(RemoveFile(victim, Some(1L), dataChange = true)),
        "FSCK")
      assert(log.update().version == v1)

      // 2. safety: a winning RE-ADD of the read path (a RESTORE landing
      //    mid-repair) invalidates the "bytes are gone" decision
      val survivor = log.update().allFiles.map(_.path).sorted.head
      val t2 = log.startTransaction()
      t2.markPathsAsRead(Seq(survivor))
      val grp = log.update().allFiles.find(_.path == survivor)
        .get.partitionValues("grp")
      log.startTransaction()
        .commit(Seq(add(grp, survivor)), DeltaOperations.Write)
      intercept[ConcurrentAppendException] {
        t2.commit(Seq(RemoveFile(survivor, Some(1L), dataChange = true)),
          "FSCK")
      }

      // 3. safety: a winning REMOVE of the read path conflicts too
      //    (someone else already repaired or deleted it)
      val survivor2 = log.update().allFiles.map(_.path).sorted.head
      val t3 = log.startTransaction()
      t3.markPathsAsRead(Seq(survivor2))
      log.startTransaction().commit(
        Seq(RemoveFile(survivor2, Some(2L), dataChange = true)),
        DeltaOperations.Delete)
      intercept[ConcurrentDeleteReadException] {
        t3.commit(Seq(RemoveFile(survivor2, Some(3L), dataChange = true)),
          "FSCK")
      }
    }
  }

  test("concurrent append into a different partition does not conflict") {
    withTempDir { dir =>
      createPartitioned(dir)
      val log = DeltaLog.forTable(spark, dir)
      val t1 = log.startTransaction()
      val t2 = log.startTransaction()
      t2.markFilesAsRead(col("grp") === "g1")
      t1.commit(Seq(add("g0", "a.parquet")), DeltaOperations.Write)
      assert(t2.commit(Seq(add("g1", "b.parquet")), DeltaOperations.Write) == 2)
    }
  }

  test("metadata change by the winner aborts the loser") {
    withTempDir { dir =>
      createPartitioned(dir)
      val log = DeltaLog.forTable(spark, dir)
      val t1 = log.startTransaction()
      val t2 = log.startTransaction()
      t2.markFilesAsRead(col("grp") === "g1")
      val m = t1.snapshot.metadata
      t1.commit(Seq(m.copy(configuration = Map("delta.appendOnly" -> "false"))),
        DeltaOperations.ManualUpdate)
      intercept[MetadataChangedException] {
        t2.commit(Seq(add("g1", "b.parquet")), DeltaOperations.Write)
      }
    }
  }

  test("reading files deleted by the winner aborts the loser") {
    withTempDir { dir =>
      createPartitioned(dir)
      val log = DeltaLog.forTable(spark, dir)
      val t1 = log.startTransaction()
      val t2 = log.startTransaction()
      val readByT2 = t2.markFilesAsRead(col("grp") === "g0")
      assert(readByT2.nonEmpty)
      t1.commit(readByT2.map(_.remove(1L)), DeltaOperations.Delete)
      intercept[ConcurrentDeleteReadException] {
        t2.commit(Seq(add("g0", "c.parquet")), DeltaOperations.Write)
      }
    }
  }

  test("both deleting the same file aborts the loser") {
    withTempDir { dir =>
      createPartitioned(dir)
      val log = DeltaLog.forTable(spark, dir)
      val victim = log.snapshot.allFiles.head
      val t1 = log.startTransaction()
      val t2 = log.startTransaction()
      t1.commit(Seq(victim.remove(1L)), DeltaOperations.Delete)
      intercept[ConcurrentDeleteDeleteException] {
        t2.commit(Seq(victim.remove(2L)), DeltaOperations.Delete)
      }
    }
  }

  test("same streaming appId committed concurrently conflicts") {
    withTempDir { dir =>
      createPartitioned(dir)
      val log = DeltaLog.forTable(spark, dir)
      val t1 = log.startTransaction()
      val t2 = log.startTransaction()
      t2.txnVersion("stream-app")
      t1.commit(Seq(SetTransaction("stream-app", 1, None), add("g0", "a.parquet")),
        DeltaOperations.StreamingUpdate)
      intercept[ConcurrentTransactionException] {
        t2.commit(Seq(SetTransaction("stream-app", 1, None), add("g1", "b.parquet")),
          DeltaOperations.StreamingUpdate)
      }
    }
  }

  test("append-only table rejects deletes") {
    withTempDir { dir =>
      DeltaTable.write((0 until 5).toDF("id"), dir,
        configuration = Map("delta.appendOnly" -> "true"))
      val log = DeltaLog.forTable(spark, dir)
      val victim = log.snapshot.allFiles.head
      val txn = log.startTransaction()
      intercept[UnsupportedOperationException] {
        txn.commit(Seq(victim.remove(1L)), DeltaOperations.Delete)
      }
    }
  }

  test("txnVersion returns the last committed version for an appId") {
    withTempDir { dir =>
      createPartitioned(dir)
      val log = DeltaLog.forTable(spark, dir)
      val t1 = log.startTransaction()
      t1.commit(Seq(SetTransaction("app-x", 42, None), add("g0", "a.parquet")),
        DeltaOperations.StreamingUpdate)
      assert(log.startTransaction().txnVersion("app-x") == 42)
      assert(log.startTransaction().txnVersion("app-y") == -1)
    }
  }

  test("first commit requires metadata") {
    withTempDir { dir =>
      val log = DeltaLog.forTable(spark, dir + "/fresh")
      val txn = new OptimisticTransaction(log,
        new Snapshot(spark, log, -1, LogSegment.empty(log.logPath), 0L, 0L))
      intercept[IllegalArgumentException] {
        txn.commit(Seq(add("g0", "a.parquet")), DeltaOperations.Write)
      }
    }
  }
}
