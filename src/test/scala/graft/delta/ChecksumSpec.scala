package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Version checksums (`<version>.crc`): incremental per-commit totals,
  * checkpoint re-seeding after chain gaps, corruption detection, and the
  * vacuumProtocolCheck GC gate. */
class ChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def crcOf(dir: String, v: Long): Option[VersionChecksum] =
    Checksums.read(DeltaLog.forTable(spark, dir), v)

  test("every commit writes a crc whose totals match the replayed state") {
    withTempDir { dir =>
      DeltaTable.write(spark.range(0, 10).toDF("v").coalesce(1), dir)
      DeltaTable.write(spark.range(10, 30).toDF("v").coalesce(1), dir)
      val log = DeltaLog.forTable(spark, dir)
      val snap = log.update()
      (0L to 1L).foreach { v =>
        val crc = crcOf(dir, v).getOrElse(fail(s"no crc at $v"))
        assert(crc.numMetadata == 1L && crc.numProtocol == 1L)
        assert(crc.protocol != null && crc.metadata != null)
      }
      val crc1 = crcOf(dir, 1).get
      assert(crc1.numFiles == snap.allFiles.size)
      assert(crc1.tableSizeBytes == snap.allFiles.map(_.size).sum)
      Checksums.validate(snap) // must not throw
    }
  }

  test("DV shade nets to zero files; rewrite-delete shrinks the totals") {
    withTempDir { dir =>
      DeltaTable.write(spark.range(0, 8).toDF("v").coalesce(1), dir,
        configuration = Map("delta.enableDeletionVectors" -> "true"))
      DeltaTable.forPath(spark, dir).delete($"v" >= 6)
      val log = DeltaLog.forTable(spark, dir)
      val snap = log.update()
      val crc = crcOf(dir, snap.version).get
      // shade: remove(path,noDv) + add(path,dv) — same file count/bytes
      assert(crc.numFiles == 1L && crc.numFiles == snap.allFiles.size)
      assert(crc.tableSizeBytes == snap.allFiles.map(_.size).sum)
      Checksums.validate(snap)
    }
  }

  test("chain gap: commits skip, the next checkpoint re-seeds, validate catches tampering") {
    withTempDir { dir =>
      DeltaTable.write(spark.range(0, 4).toDF("v").coalesce(1), dir)
      val log = DeltaLog.forTable(spark, dir)
      // simulate a foreign writer: delete v0's crc, then keep committing
      val fs = log.logPath.getFileSystem(log.hadoopConf)
      fs.delete(FileNames.checksumFile(log.logPath, 0), false)
      (1 to 9).foreach { i =>
        DeltaTable.write(spark.range(i * 10, i * 10 + 2).toDF("v")
          .coalesce(1), dir)
      }
      // versions 1..9 had no predecessor crc -> none written
      assert((1L to 9L).forall(crcOf(dir, _).isEmpty))
      // v10 checkpoints (interval 10) and re-seeds from the state
      DeltaTable.write(spark.range(100, 102).toDF("v").coalesce(1), dir)
      val snap = log.update()
      assert(snap.version == 10L)
      val crc10 = crcOf(dir, 10).getOrElse(fail("checkpoint did not re-seed"))
      assert(crc10.numFiles == snap.allFiles.size)
      // and the chain continues incrementally from the re-seed
      DeltaTable.write(spark.range(200, 202).toDF("v").coalesce(1), dir)
      assert(crcOf(dir, 11).exists(_.numFiles == crc10.numFiles + 1))
      // tamper the CURRENT version's crc: validation must fail loudly
      val cur = log.update().version
      val bad = crcOf(dir, cur).get
      Checksums.write(log, cur, bad.copy(numFiles = bad.numFiles + 5))
      val e = intercept[IllegalStateException] {
        Checksums.validate(log.update())
      }
      assert(e.getMessage.contains("checksum mismatch"))
    }
  }

  test("row-tracking backfill re-adds don't corrupt the checksum chain") {
    withTempDir { dir =>
      DeltaTable.write(spark.range(0, 4).toDF("v").coalesce(1), dir)
      DeltaTable.write(spark.range(4, 6).toDF("v").coalesce(1), dir)
      val log = DeltaLog.forTable(spark, dir)
      val txn = log.startTransaction()
      val m = txn.snapshot.metadata
      txn.updateMetadata(m.copy(configuration =
        m.configuration + ("delta.enableRowTracking" -> "true")))
      txn.commit(Nil, "SET TBLPROPERTIES") // backfills BOTH live files
      val snap = log.update()
      // the backfill commit's crc must reflect the REPLAYED state (2
      // files), not prev + 2 re-adds (4) — and the chain continues
      val crc = crcOf(dir, snap.version).getOrElse(fail("no crc"))
      assert(crc.numFiles == 2L)
      Checksums.validate(snap)
      DeltaTable.write(spark.range(6, 8).toDF("v").coalesce(1), dir)
      val snap2 = log.update()
      assert(crcOf(dir, snap2.version).exists(_.numFiles == 3L))
      Checksums.validate(snap2)
    }
  }

  test("opt-in validation gate fails a corrupted log at snapshot refresh") {
    withTempDir { dir =>
      DeltaTable.write(spark.range(0, 4).toDF("v").coalesce(1), dir)
      val log = DeltaLog.forTable(spark, dir)
      val cur = log.update().version
      val bad = crcOf(dir, cur).get
      Checksums.write(log, cur, bad.copy(numFiles = bad.numFiles + 5))
      spark.conf.set(Checksums.ValidateConfKey, "true")
      try {
        DeltaLog.clearCache()
        val e = intercept[IllegalStateException] {
          DeltaLog.forTable(spark, dir).update()
        }
        assert(e.getMessage.contains("checksum mismatch"))
      } finally spark.conf.unset(Checksums.ValidateConfKey)
      // default-off: the corrupted crc does not block reads unless asked
      DeltaLog.clearCache()
      assert(DeltaLog.forTable(spark, dir).update().version == cur)
    }
  }

  test("a post-durability refresh failure surfaces as " +
      "PostCommitHookException, never as a retryable commit failure") {
    // the write at version N is DURABLE before the commit loop refreshes
    // the snapshot; if that refresh throws (here: the opt-in validation
    // gate tripping on a checksum planted for N), a generic exception
    // would invite a caller retry that double-applies the commit. The
    // marker type says "committed, post-step failed" — and the txn
    // object itself must refuse a re-commit.
    withTempDir { dir =>
      DeltaTable.write(spark.range(0, 4).toDF("v").coalesce(1), dir)
      val log = DeltaLog.forTable(spark, dir)
      val cur = log.update().version
      // plant a WRONG checksum for the NEXT version: the commit itself
      // succeeds, then update()'s validation gate throws
      val bad = crcOf(dir, cur).get
      Checksums.write(log, cur + 1, bad.copy(numFiles = 999L))
      spark.conf.set(Checksums.ValidateConfKey, "true")
      try {
        val txn = log.startTransaction()
        val e = intercept[graft.delta.txn.PostCommitHookException] {
          txn.commit(Seq(AddFile("pc.parquet", Map.empty, 1L, 1L,
            dataChange = true)), "RACE")
        }
        assert(e.version == cur + 1)
        // the commit IS durable
        assert(log.store.read(FileNames.deltaFile(log.logPath, cur + 1),
          log.hadoopConf).nonEmpty)
        // and the txn cannot be replayed into a double-apply
        val e2 = intercept[IllegalArgumentException] {
          txn.commit(Seq(AddFile("pc2.parquet", Map.empty, 1L, 1L,
            dataChange = true)), "RACE")
        }
        assert(e2.getMessage.contains("already committed"))
      } finally {
        spark.conf.unset(Checksums.ValidateConfKey)
        // repair the planted crc so the temp dir tears down clean
        Checksums.write(log, cur + 1, bad.copy(numFiles = bad.numFiles + 1))
        DeltaLog.clearCache()
      }
    }
  }

  test("expired crc files clean up with their commits") {
    withTempDir { dir =>
      val start = System.currentTimeMillis()
      (0 until 11).foreach { i =>
        DeltaTable.write(spark.range(i, i + 1).toDF("v").coalesce(1), dir)
      }
      val log = DeltaLog.forTable(spark, dir)
      log.clock = () => start + 60L * 24 * 3600 * 1000
      val deleted = log.cleanUpExpiredLogs()
      assert(deleted > 0)
      val fs = log.logPath.getFileSystem(log.hadoopConf)
      // crcs for reclaimed versions (1..9; the listing starts at 0.json
      // so 0.crc sorts before it and survives) are gone with their commits
      assert((1L to 9L).forall(v =>
        !fs.exists(FileNames.checksumFile(log.logPath, v))))
      assert(fs.exists(FileNames.checksumFile(log.logPath, 10)))
    }
  }

  test("vacuumProtocolCheck: GC refuses a protocol with unknown features") {
    withTempDir { dir =>
      DeltaTable.write(spark.range(0, 4).toDF("v").coalesce(1), dir)
      val log = DeltaLog.forTable(spark, dir)
      // a table that LISTS vacuumProtocolCheck vacuums fine
      val txn = log.startTransaction()
      txn.commit(Seq(Protocol(3, 7,
        readerFeatures = Some(Seq("vacuumProtocolCheck")),
        writerFeatures = Some(Seq("appendOnly", "invariants",
          "vacuumProtocolCheck")))), "UPGRADE")
      DeltaTable.forPath(spark, dir).vacuum(dryRun = true)
      // foreign log with an unknown writer feature: vacuum names it
      val line = JsonCodec.toJson(Protocol(1, 7,
        writerFeatures = Some(Seq("futureCompactionV9"))): Action)
      log.store.write(FileNames.deltaFile(log.logPath, 2),
        Iterator(line), overwrite = false, log.hadoopConf)
      val e = intercept[IllegalArgumentException] {
        DeltaTable.forPath(spark, dir).vacuum(dryRun = true)
      }
      assert(e.getMessage.contains("futureCompactionV9"))
    }
  }
}
