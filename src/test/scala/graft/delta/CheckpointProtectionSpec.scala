package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** checkpointProtection: the log prefix below
  * `delta.requireCheckpointProtectionBeforeVersion` cleans up
  * all-or-nothing against a retained boundary checkpoint — partial
  * deletion could orphan versions only a protected checkpoint can
  * serve. Foreign tables carrying the feature (previously refused by
  * name) now read and write. */
class CheckpointProtectionSpec extends SparkSpec {
  import spark.implicits._

  private def logFiles(log: DeltaLog): Set[String] = {
    val fs = log.logPath.getFileSystem(log.hadoopConf)
    fs.listStatus(log.logPath).map(_.getPath.getName)
      .filterNot(_.startsWith("_")).toSet
  }

  test("foreign table declaring checkpointProtection reads and writes") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1L, "a")).toDF("id", "v"), dir)
      val log = DeltaLog.forTable(spark, dir)
      val m = log.update().metadata
      val newM = m.copy(configuration = m.configuration +
        ("delta.requireCheckpointProtectionBeforeVersion" -> "2"))
      val p = Protocol(1, 7, writerFeatures = Some(Seq(
        "appendOnly", "invariants", "checkpointProtection")))
      log.store.write(FileNames.deltaFile(log.logPath, 1),
        Iterator(JsonCodec.toJson(p: Action), JsonCodec.toJson(newM: Action)),
        overwrite = false, log.hadoopConf)
      DeltaLog.clearCache()
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 1)
      DeltaTable.write(Seq((2L, "b")).toDF("id", "v"), dir)
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 2)
    }
  }

  test("protected prefix survives partial expiry; cleans once whole") {
    withTempDir { dir =>
      val start = System.currentTimeMillis()
      // 11 commits -> checkpoint at v10
      (0 until 11).foreach { i =>
        DeltaTable.write(spark.range(i, i + 1).toDF("v").coalesce(1), dir,
          configuration = if (i == 0) Map(
            "delta.requireCheckpointProtectionBeforeVersion" -> "6")
          else Map.empty)
      }
      val log = DeltaLog.forTable(spark, dir)
      assert(Checkpoints.lastCheckpoint(log).exists(_.version == 10L))

      // age ONLY part of the protected prefix (v0..v3): the boundary
      // checkpoint exists (10 >= 6) but the prefix is not wholly
      // expired, so NOTHING below 6 may be deleted — while the
      // unprotected expired range (none here yet) cleans normally
      // default clock: cutoff sits ~30 days back, so only EXPLICITLY
      // aged files count as expired
      val fs = log.logPath.getFileSystem(log.hadoopConf)
      val old = start - 120L * 24 * 3600 * 1000
      (0L to 3L).foreach { v =>
        fs.setTimes(FileNames.deltaFile(log.logPath, v), old, -1)
        val crc = FileNames.checksumFile(log.logPath, v)
        if (fs.exists(crc)) fs.setTimes(crc, old, -1)
      }
      log.cleanUpExpiredLogs()
      assert((0L to 3L).forall(v =>
        fs.exists(FileNames.deltaFile(log.logPath, v))),
        s"partially-expired protected prefix must survive: ${logFiles(log)}")

      // age the WHOLE protected prefix (and some of the unprotected
      // range): now the prefix cleans in one go with the rest
      (0L to 9L).foreach { v =>
        fs.setTimes(FileNames.deltaFile(log.logPath, v), old, -1)
        val crc = FileNames.checksumFile(log.logPath, v)
        if (fs.exists(crc)) fs.setTimes(crc, old, -1)
      }
      val deleted = log.cleanUpExpiredLogs()
      assert(deleted > 0)
      assert((0L to 5L).forall(v =>
        !fs.exists(FileNames.deltaFile(log.logPath, v))),
        s"wholly-expired protected prefix must clean: ${logFiles(log)}")
      // the table still reads through the retained checkpoint
      DeltaLog.clearCache()
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 11)
    }
  }

  test("no boundary checkpoint: the protected range never cleans") {
    withTempDir { dir =>
      val start = System.currentTimeMillis()
      (0 until 11).foreach { i =>
        DeltaTable.write(spark.range(i, i + 1).toDF("v").coalesce(1), dir,
          configuration = if (i == 0) Map(
            // protected horizon BEYOND the newest checkpoint (10 < 20)
            "delta.requireCheckpointProtectionBeforeVersion" -> "20")
          else Map.empty)
      }
      val log = DeltaLog.forTable(spark, dir)
      val fs = log.logPath.getFileSystem(log.hadoopConf)
      val old = start - 120L * 24 * 3600 * 1000
      (0L to 9L).foreach { v =>
        fs.setTimes(FileNames.deltaFile(log.logPath, v), old, -1)
        val crc = FileNames.checksumFile(log.logPath, v)
        if (fs.exists(crc)) fs.setTimes(crc, old, -1)
      }
      log.clock = () => start + 60L * 24 * 3600 * 1000
      log.cleanUpExpiredLogs()
      assert((0L to 9L).forall(v =>
        fs.exists(FileNames.deltaFile(log.logPath, v))),
        s"no checkpoint at/past the boundary: nothing may clean: " +
          logFiles(log))
    }
  }
}
