package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.delta.txn.RowTracking

/** Row tracking (writer feature rowTracking): disjoint baseRowId ranges
  * per file from the delta.rowTracking high-water mark, stable ids under
  * deletion-vector DML, reassignment (not abort) under races, backfill on
  * enablement, checkpoint round-trip. */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(dir: String): Map[Long, Long] =
    DeltaTable.forPath(spark, dir).toDFWithRowIds
      .select(col("v"), col("_row_id")).as[(Long, Long)].collect().toMap

  test("appends reserve disjoint monotone ranges; scan exposes ids") {
    withTempDir { dir =>
      DeltaTable.write(spark.range(0, 5).toDF("v").coalesce(1), dir,
        configuration = Map("delta.enableRowTracking" -> "true"))
      DeltaTable.write(spark.range(5, 8).toDF("v").coalesce(1), dir)
      val snap = DeltaLog.forTable(spark, dir).update()
      val p = snap.protocol
      assert(p.minWriterVersion == 7 &&
        p.writerFeatures.exists(fs =>
          fs.contains("rowTracking") && fs.contains("domainMetadata")))
      assert(RowTracking.highWaterMark(snap.domainMetadata) == 7L)
      val adds = snap.allFiles.sortBy(_.baseRowId.get)
      assert(adds.map(a => (a.baseRowId.get, a.defaultRowCommitVersion.get))
        == Seq((0L, 0L), (5L, 1L)))
      // coalesce(1) + range order makes position == v within each file
      assert(ids(dir) == (0L to 7L).map(v => v -> v).toMap)
      val vers = DeltaTable.forPath(spark, dir).toDFWithRowIds
        .select(col("v"), col("_row_commit_version")).as[(Long, Long)]
        .collect().toMap
      assert((0L to 4L).forall(vers(_) == 0L) &&
        (5L to 7L).forall(vers(_) == 1L))
    }
  }

  test("concurrent appends reassign past the winner instead of aborting") {
    withTempDir { dir =>
      DeltaTable.write(spark.range(0, 2).toDF("v").coalesce(1), dir,
        configuration = Map("delta.enableRowTracking" -> "true"))
      val threads = (0 until 2).map { t =>
        new Thread(() => {
          DeltaTable.write(
            spark.range(10 * (t + 1), 10 * (t + 1) + 5).toDF("v")
              .coalesce(1), dir)
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val snap = DeltaLog.forTable(spark, dir).update()
      val ranges = snap.allFiles.map(a =>
        (a.baseRowId.get, a.baseRowId.get + RowTracking.numRecords(a) - 1))
      // 12 rows total; every reservation disjoint, hwm past them all
      assert(ranges.size == 3)
      val sorted = ranges.sortBy(_._1)
      assert(sorted.sliding(2).forall {
        case Seq((_, e1), (s2, _)) => s2 > e1; case _ => true })
      assert(RowTracking.highWaterMark(snap.domainMetadata) ==
        sorted.map(_._2).max)
      val allIds = DeltaTable.forPath(spark, dir).toDFWithRowIds
        .select(col("_row_id")).as[Long].collect()
      assert(allIds.distinct.length == 12)
    }
  }

  test("deletion-vector DML preserves surviving row ids") {
    withTempDir { dir =>
      DeltaTable.write(spark.range(0, 6).toDF("v").coalesce(1), dir,
        configuration = Map(
          "delta.enableRowTracking" -> "true",
          "delta.enableDeletionVectors" -> "true"))
      val before = ids(dir)
      DeltaTable.forPath(spark, dir).delete(col("v").isin(1, 3))
      val after = ids(dir)
      assert(after == before.removedAll(Seq(1L, 3L)))
      // the shaded file keeps its range: same baseRowId, same version
      val add = DeltaLog.forTable(spark, dir).update().allFiles.head
      assert(add.deletionVector.isDefined && add.baseRowId.contains(0L) &&
        add.defaultRowCommitVersion.contains(0L))
    }
  }

  test("enabling on an existing table backfills every live file") {
    withTempDir { dir =>
      DeltaTable.write(spark.range(0, 4).toDF("v").coalesce(1), dir)
      DeltaTable.write(spark.range(4, 6).toDF("v").coalesce(1), dir)
      val log = DeltaLog.forTable(spark, dir)
      assert(log.update().allFiles.forall(_.baseRowId.isEmpty))
      val txn = log.startTransaction()
      val m = txn.snapshot.metadata
      txn.updateMetadata(m.copy(configuration =
        m.configuration + ("delta.enableRowTracking" -> "true")))
      txn.commit(Nil, "SET TBLPROPERTIES")
      val snap = log.update()
      assert(snap.allFiles.forall(_.baseRowId.isDefined))
      assert(RowTracking.highWaterMark(snap.domainMetadata) == 5L)
      assert(ids(dir).values.toSeq.sorted == (0L to 5L))
      // later appends continue past the backfill
      DeltaTable.write(spark.range(6, 8).toDF("v").coalesce(1), dir)
      assert(ids(dir).values.toSeq.sorted == (0L to 7L))
    }
  }

  test("enablement backfill loses a race loudly instead of dropping files") {
    withTempDir { dir =>
      DeltaTable.write(spark.range(0, 4).toDF("v").coalesce(1), dir)
      val log = DeltaLog.forTable(spark, dir)
      val txn = log.startTransaction()
      val m = txn.snapshot.metadata
      txn.updateMetadata(m.copy(configuration =
        m.configuration + ("delta.enableRowTracking" -> "true")))
      // a concurrent append wins the race: its files would silently
      // escape a backfill computed from our stale read snapshot, so the
      // enablement must fail its conflict check (Serializable +
      // whole-table read), not commit
      DeltaTable.write(spark.range(4, 6).toDF("v").coalesce(1), dir)
      intercept[graft.delta.txn.ConcurrentAppendException] {
        txn.commit(Nil, "SET TBLPROPERTIES")
      }
      // retried on a fresh snapshot, EVERY live file (including the
      // winner's) gets an id
      val txn2 = log.startTransaction()
      val m2 = txn2.snapshot.metadata
      txn2.updateMetadata(m2.copy(configuration =
        m2.configuration + ("delta.enableRowTracking" -> "true")))
      txn2.commit(Nil, "SET TBLPROPERTIES")
      val snap = log.update()
      assert(snap.allFiles.forall(_.baseRowId.isDefined))
      assert(ids(dir).values.toSeq.sorted == (0L to 5L))
    }
  }

  test("enablement backfill aborts when a concurrent delete removed files") {
    withTempDir { dir =>
      DeltaTable.write(spark.range(0, 4).toDF("v").coalesce(1), dir)
      DeltaTable.write(spark.range(4, 6).toDF("v").coalesce(1), dir)
      val log = DeltaLog.forTable(spark, dir)
      val txn = log.startTransaction()
      val m = txn.snapshot.metadata
      txn.updateMetadata(m.copy(configuration =
        m.configuration + ("delta.enableRowTracking" -> "true")))
      // a concurrent whole-file delete wins: our backfill would re-add
      // (resurrect) the removed file
      DeltaTable.forPath(spark, dir).delete(col("v") >= 4)
      intercept[graft.delta.txn.ConcurrentModificationException] {
        txn.commit(Nil, "SET TBLPROPERTIES")
      }
      // the deleted rows stay deleted after a fresh-snapshot retry
      val txn2 = log.startTransaction()
      val m2 = txn2.snapshot.metadata
      txn2.updateMetadata(m2.copy(configuration =
        m2.configuration + ("delta.enableRowTracking" -> "true")))
      txn2.commit(Nil, "SET TBLPROPERTIES")
      assert(ids(dir).keySet == (0L to 3L).toSet)
    }
  }

  test("zero-record files still get unique baseRowIds") {
    val adds = Seq(
      AddFile("a", Map.empty, 10L, 0L, dataChange = true,
        stats = Some("""{"numRecords":0}""")),
      AddFile("b", Map.empty, 10L, 0L, dataChange = true,
        stats = Some("""{"numRecords":0}""")),
      AddFile("c", Map.empty, 10L, 0L, dataChange = true,
        stats = Some("""{"numRecords":3}""")))
    val (stamped, hwm) = RowTracking.assign(adds, 1L, -1L)
    val bases = stamped.collect { case a: AddFile => a.baseRowId.get }
    assert(bases.distinct.size == 3, s"duplicate baseRowId in $bases")
    assert(hwm == bases.max + 2) // c's 3 records end the range
  }

  test("ranges and hwm survive a checkpoint round-trip") {
    withTempDir { dir =>
      (0 until 11).foreach { i =>
        DeltaTable.write(spark.range(i * 2, i * 2 + 2).toDF("v")
          .coalesce(1), dir,
          configuration = if (i == 0)
            Map("delta.enableRowTracking" -> "true") else Map.empty)
      }
      DeltaLog.clearCache()
      val snap = DeltaLog.forTable(spark, dir).update()
      // the fresh listing must replay THROUGH the v10 checkpoint — this
      // proves the new add columns round-trip the checkpoint parquet
      assert(snap.logSegment.checkpointVersion.contains(10L))
      assert(RowTracking.highWaterMark(snap.domainMetadata) == 21L)
      assert(snap.allFiles.forall(_.baseRowId.isDefined))
      assert(ids(dir).values.toSeq.sorted == (0L to 21L))
    }
  }

  test("clone starts its own counter: ranges stripped, reassigned") {
    withTempDir { src =>
      withTempDir { dst0 =>
        val dst = dst0 + "/t"
        DeltaTable.write(spark.range(0, 3).toDF("v").coalesce(1), src,
          configuration = Map("delta.enableRowTracking" -> "true"))
        DeltaTable.write(spark.range(3, 5).toDF("v").coalesce(1), src)
        DeltaTable.forPath(spark, src).cloneTo(dst)
        val snap = DeltaLog.forTable(spark, dst).update()
        // the clone's protocol keeps the feature, so its commit reassigns
        // fresh contiguous ranges from ITS OWN counter
        assert(snap.allFiles.forall(_.baseRowId.isDefined))
        assert(RowTracking.highWaterMark(snap.domainMetadata) == 4L)
        assert(ids(dst).values.toSeq.sorted == (0L to 4L))
      }
    }
  }
}
