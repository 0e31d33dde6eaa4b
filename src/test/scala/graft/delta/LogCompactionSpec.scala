package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** READ tolerance for log compaction files
  * (`{start}.{end}.compacted.json`, delta PROTOCOL.md "Log Compaction
  * Files"): hand-built FOREIGN-shaped fixtures — this engine never
  * writes them — must replay to the identical state whether or not the
  * constituent commits are still present, be preferred over their
  * constituents (fewer log reads), and be ignored when they straddle
  * the checkpoint boundary. */
class LogCompactionSpec extends SparkSpec {
  import spark.implicits._

  /** Newest-wins reconciliation of the given commit versions, the way a
    * compacting writer builds the file: last file action per path wins
    * (tombstones kept), latest metadata/protocol kept if present. */
  private def reconcile(log: DeltaLog, versions: Range): Seq[String] = {
    val all = versions.flatMap { v =>
      log.store.read(FileNames.deltaFile(log.logPath, v), log.hadoopConf)
        .map(JsonCodec.actionFromJson).filter(_ != null)
        .map(a => (v, a))
    }
    val byPath = scala.collection.mutable.LinkedHashMap[String, Action]()
    val rest = scala.collection.mutable.ArrayBuffer[Action]()
    all.foreach {
      case (_, a: AddFile) => byPath(a.path) = a
      case (_, r: RemoveFile) => byPath(r.path) = r
      case (_, m: Metadata) => rest.clear(); rest += m // latest wins; fixture has ≤1
      case _ => () // commitInfo etc. dropped, as a minimal compactor may
    }
    (rest.toSeq ++ byPath.values.toSeq).map(JsonCodec.toJson)
  }

  private def writeCompacted(log: DeltaLog, s: Long, e: Long,
                             lines: Seq[String]): Unit =
    log.store.write(FileNames.compactedFile(log.logPath, s, e),
      lines.iterator, overwrite = false, log.hadoopConf)

  private def state(dir: String): (Long, Set[Seq[Any]]) = {
    DeltaLog.clearCache()
    val log = DeltaLog.forTable(spark, dir)
    val snap = log.update()
    (snap.version,
      DeltaTable.forPath(spark, dir).toDF.collect().map(_.toSeq).toSet)
  }

  test("compacted range substitutes for its commits: preferred when " +
      "present, sufficient when originals are gone") {
    withTempDir { dir =>
      // v0 create, v1..v4 appends, v5 delete — delete AFTER the range so
      // a tombstone lands atop compacted-sourced adds
      DeltaTable.write(Seq((0, "base")).toDF("v", "who"), dir)
      (1 to 4).foreach(i =>
        DeltaTable.write(Seq((i, s"c$i")).toDF("v", "who"), dir))
      DeltaTable.forPath(spark, dir).delete($"v" === 2)
      val (v0, data0) = state(dir)
      assert(v0 == 5 && data0.size == 4)

      val log = DeltaLog.forTable(spark, dir)
      writeCompacted(log, 1, 4, reconcile(log, 1 to 4))
      // also a SHORTER overlapping range: the cover must take the longest
      writeCompacted(log, 1, 3, reconcile(log, 1 to 3))

      // with originals still present: same state, compacted PREFERRED
      val (v1, data1) = state(dir)
      assert(v1 == v0 && data1 == data0)
      val seg = DeltaLog.forTable(spark, dir).update().logSegment
      val names = seg.deltas.map(_.getPath.getName)
      val (ranges, plains) = names.partition(n =>
        n.contains(".compacted."))
      assert(ranges.size == 1 && ranges.head.contains("4.compacted"),
        s"longest compacted range must be chosen: $names")
      assert(plains.forall(n => FileNames.deltaVersion(new Path(n)) == 0 ||
        FileNames.deltaVersion(new Path(n)) == 5),
        s"covered singles must be dropped from the segment: $names")

      // originals 1..4 deleted out-of-band: state still reconstructs
      (1 to 4).foreach { v =>
        val f = new java.io.File(
          FileNames.deltaFile(log.logPath, v).toUri.getPath)
        assert(f.delete(), s"fixture commit $v must exist")
      }
      val (v2, data2) = state(dir)
      assert(v2 == v0 && data2 == data0)

      // time travel to v3 still works: the SHORTER range (1..3) ends
      // exactly there and substitutes for the deleted originals
      DeltaLog.clearCache()
      val at3 = DeltaLog.forTable(spark, dir).getSnapshotForVersionAsOf(3)
      assert(at3.version == 3 && at3.toDF.count() == 4)
      // v2 sits strictly INSIDE both ranges — without the originals it
      // must fail with the contiguity error, not silently misread
      val e = intercept[Exception] {
        DeltaLog.clearCache()
        DeltaLog.forTable(spark, dir).getSnapshotForVersionAsOf(2)
      }
      assert(e.getMessage.contains("not contiguous") ||
        e.getMessage.contains("Cannot time travel"), e.getMessage)

      // distributed replay keys the compacted file at its end version too
      DeltaLog.clearCache()
      spark.conf.set(Snapshot.DriverStateMaxBytesKey, "0")
      try {
        val (v3, data3) = state(dir)
        assert(v3 == v0 && data3 == data0)
      } finally spark.conf.unset(Snapshot.DriverStateMaxBytesKey)
    }
  }

  test("compactLog WRITES a protocol-shaped range file: replay equality " +
      "without originals, ICT tail preserved, idempotent") {
    withTempDir { dir =>
      DeltaTable.write(Seq((0, "base")).toDF("v", "who"), dir)
      (1 to 4).foreach(i =>
        DeltaTable.write(Seq((i, s"c$i")).toDF("v", "who"), dir))
      DeltaTable.forPath(spark, dir).delete($"v" === 3) // v5: remove INSIDE
      DeltaTable.write(Seq((6, "c6")).toDF("v", "who"), dir) // v6 plain tail
      val (v0, data0) = state(dir)
      assert(v0 == 6)

      val log = DeltaLog.forTable(spark, dir)
      val f = log.compactLog(1, 5)
      assert(FileNames.isCompactedFile(f) &&
        FileNames.compactedRange(f) == (1L, 5L))
      // idempotent: the second call must not throw on the existing file
      log.compactLog(1, 5)

      // the reconciled range must carry the delete's tombstone (newest
      // wins INSIDE the range) and the last commit's CommitInfo
      val actions = log.store.read(f, log.hadoopConf)
        .map(JsonCodec.actionFromJson).filter(_ != null)
      assert(actions.exists(_.isInstanceOf[CommitInfo]))
      val removed = actions.collect { case r: RemoveFile => r.path }
      assert(removed.nonEmpty, "the in-range delete must survive as a tombstone")
      assert(!actions.collect { case a: AddFile => a.path }
        .exists(removed.toSet), "a removed path must not also be live")

      (1 to 5).foreach { v =>
        val jf = new java.io.File(
          FileNames.deltaFile(log.logPath, v).toUri.getPath)
        assert(jf.delete())
      }
      val (v1, data1) = state(dir)
      assert(v1 == v0 && data1 == data0)
    }
  }

  test("cadence hook: graft.logCompaction.interval=N writes a range every " +
      "N commits; off by default") {
    withTempDir { dir =>
      DeltaTable.write(Seq((0, "x")).toDF("v", "who"), dir,
        configuration = Map("graft.logCompaction.interval" -> "3"))
      (1 to 7).foreach(i =>
        DeltaTable.write(Seq((i, s"c$i")).toDF("v", "who"), dir))
      val log = DeltaLog.forTable(spark, dir)
      val fs = log.logPath.getFileSystem(log.hadoopConf)
      assert(fs.exists(FileNames.compactedFile(log.logPath, 1, 3)))
      assert(fs.exists(FileNames.compactedFile(log.logPath, 4, 6)))
      assert(!fs.exists(FileNames.compactedFile(log.logPath, 5, 7)),
        "ranges are interval-aligned")
      // replay equality THROUGH the cadence-written ranges
      (1 to 6).foreach { v =>
        assert(new java.io.File(
          FileNames.deltaFile(log.logPath, v).toUri.getPath).delete())
      }
      val (v, data) = state(dir)
      assert(v == 7 && data.size == 8)
    }
    withTempDir { dir =>
      DeltaTable.write(Seq((0, "x")).toDF("v", "who"), dir)
      (1 to 4).foreach(i =>
        DeltaTable.write(Seq((i, s"c$i")).toDF("v", "who"), dir))
      val log = DeltaLog.forTable(spark, dir)
      val fs = log.logPath.getFileSystem(log.hadoopConf)
      val listed = fs.listStatus(log.logPath)
        .map(_.getPath.getName).filter(_.contains("compacted"))
      assert(listed.isEmpty, s"no cadence by default: ${listed.toSeq}")
    }
  }

  test("expired compacted ranges below the newest checkpoint are cleaned up") {
    withTempDir { dir =>
      DeltaTable.write(Seq((0, "base")).toDF("v", "who"), dir)
      (1 to 4).foreach(i =>
        DeltaTable.write(Seq((i, s"c$i")).toDF("v", "who"), dir))
      val log = DeltaLog.forTable(spark, dir)
      log.compactLog(1, 3)
      Checkpoints.writeCheckpoint(log.update())
      val f = new java.io.File(
        FileNames.compactedFile(log.logPath, 1, 3).toUri.getPath)
      assert(f.exists())
      // age everything, then advance the clock past retention
      val old = System.currentTimeMillis() - 90L * 24 * 3600 * 1000
      new java.io.File(log.logPath.toUri.getPath).listFiles()
        .foreach(_.setLastModified(old))
      log.clock = () => System.currentTimeMillis()
      assert(log.cleanUpExpiredLogs() > 0)
      assert(!f.exists(),
        "an expired compacted range below the checkpoint must be deleted")
      // the table still reads (checkpoint + nothing newer)
      val snap = { DeltaLog.clearCache()
        DeltaLog.forTable(spark, dir).update() }
      assert(snap.version == 4 && snap.toDF.count() == 5)
    }
  }

  test("an ICT table's tail timestamp survives a compacted tail (the " +
      "range file carries the last commit's CommitInfo)") {
    withTempDir { dir =>
      DeltaTable.write(Seq((0, "x")).toDF("v", "who"), dir,
        configuration = Map("delta.enableInCommitTimestamps" -> "true"))
      (1 to 4).foreach(i =>
        DeltaTable.write(Seq((i, s"c$i")).toDF("v", "who"), dir))
      val log = DeltaLog.forTable(spark, dir)
      val ictBefore = log.update().inCommitTimestampOpt
      assert(ictBefore.isDefined, "ICT table must carry a tail timestamp")
      log.compactLog(1, 4)
      (1 to 4).foreach(v => assert(new java.io.File(
        FileNames.deltaFile(log.logPath, v).toUri.getPath).delete()))
      DeltaLog.clearCache()
      val after = DeltaLog.forTable(spark, dir).update()
      assert(after.version == 4)
      assert(after.inCommitTimestampOpt == ictBefore,
        s"tail ICT must come through the compacted entry: " +
          s"$ictBefore -> ${after.inCommitTimestampOpt}")
    }
  }

  test("streaming source fails loudly on a burned mid-range commit; " +
      "failOnDataLoss=false processes the rest") {
    withTempDir { dir =>
      import org.apache.spark.sql.streaming.Trigger
      DeltaTable.write(Seq(0).toDF("value"), dir)
      (1 to 5).foreach(i => DeltaTable.write(Seq(i).toDF("value"), dir))
      val log = DeltaLog.forTable(spark, dir)
      Checkpoints.writeCheckpoint(log.update()) // snapshot stays readable
      assert(new java.io.File(
        FileNames.deltaFile(log.logPath, 2).toUri.getPath).delete())
      DeltaLog.clearCache()

      val q = spark.readStream.format("graft-delta")
        .option("startingVersion", "1")
        .load(dir)
        .writeStream.format("memory").queryName("gap_strict")
        .trigger(Trigger.AvailableNow())
        .start()
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination(60000)
      }
      assert(e.getMessage.contains("missing from the log") ||
        Option(e.getCause).exists(_.getMessage.contains("missing from the log")),
        s"stream must fail loudly: ${e.getMessage}")

      val q2 = spark.readStream.format("graft-delta")
        .option("startingVersion", "1")
        .option("failOnDataLoss", "false")
        .load(dir)
        .writeStream.format("memory").queryName("gap_tolerant")
        .trigger(Trigger.AvailableNow())
        .start()
      q2.awaitTermination(60000)
      val got = spark.table("gap_tolerant").as[Int].collect().sorted.toSeq
      assert(got == Seq(1, 3, 4, 5), s"opt-out must skip only the hole: $got")
    }
  }

  test("a premature compacted range never advances the version line: " +
      "compacted ends extend it only by contiguous chaining") {
    withTempDir { dir =>
      DeltaTable.write(Seq((0, "base")).toDF("v", "who"), dir)
      (1 to 5).foreach(i =>
        DeltaTable.write(Seq((i, s"c$i")).toDF("v", "who"), dir))
      val (v0, data0) = state(dir)
      assert(v0 == 5)
      val log = DeltaLog.forTable(spark, dir)
      // a compactor that crashed after writing its file optimistically:
      // the name CLAIMS 1..20 but commits only reach 5 — it must be
      // ignored for both the version line and the cover (its content
      // here is even truthful for 1..5, which makes silent acceptance
      // the dangerous outcome)
      writeCompacted(log, 1, 20, reconcile(log, 1 to 5))
      val (v1, data1) = state(dir)
      assert(v1 == 5, s"premature range must not advance the version: $v1")
      assert(data1 == data0)
      val seg = DeltaLog.forTable(spark, dir).update().logSegment
      assert(seg.deltas.forall(f => !FileNames.isCompactedFile(f.getPath)))
      // a CHAINING range (6..8 atop head 5) would be trusted — that is
      // the documented boundary — but only when it starts exactly at
      // head + 1; one starting beyond leaves the version at the commits
      writeCompacted(log, 7, 9, reconcile(log, 1 to 2)) // gap at 6: ignored
      val (v2, _) = state(dir)
      assert(v2 == 5, s"non-chaining range must not extend: $v2")
    }
  }

  test("a compacted range straddling the checkpoint is ignored") {
    withTempDir { dir =>
      DeltaTable.write(Seq((0, "base")).toDF("v", "who"), dir)
      (1 to 4).foreach(i =>
        DeltaTable.write(Seq((i, s"c$i")).toDF("v", "who"), dir))
      val log = DeltaLog.forTable(spark, dir)
      Checkpoints.writeCheckpoint(log.update())
      DeltaTable.write(Seq((5, "c5")).toDF("v", "who"), dir)
      val (v0, data0) = state(dir)

      // range 1..5 starts BELOW the checkpoint (4): must be ignored even
      // though its end extends past it
      val log2 = DeltaLog.forTable(spark, dir)
      writeCompacted(log2, 1, 5, reconcile(log2, 1 to 5))
      val (v1, data1) = state(dir)
      assert(v1 == v0 && data1 == data0)
      val seg = DeltaLog.forTable(spark, dir).update().logSegment
      assert(seg.deltas.forall(f => !FileNames.isCompactedFile(f.getPath)),
        s"straddling range must not be used: ${seg.deltas.map(_.getPath.getName)}")
      assert(seg.checkpointVersion.contains(4L))
    }
  }

  test("compactLog ABORTS on an action it cannot model instead of " +
      "writing a lossy compacted file") {
    withTempDir { dir =>
      DeltaTable.write(Seq((0, "base")).toDF("v", "who"), dir)
      (1 to 3).foreach(i =>
        DeltaTable.write(Seq((i, s"c$i")).toDF("v", "who"), dir))
      val log = DeltaLog.forTable(spark, dir)
      // splice a future-engine action into commit 2: state replay
      // TOLERATES it (unknown lines are skipped), but a compacted file
      // is PREFERRED over the originals, so dropping the line there
      // would lose it for every reader that can model it
      val p = FileNames.deltaFile(log.logPath, 2)
      val lines = log.store.read(p, log.hadoopConf)
      val fs = p.getFileSystem(log.hadoopConf)
      fs.delete(p, false)
      log.store.write(p,
        (lines :+ """{"futureAction":{"payload":1}}""").iterator,
        overwrite = false, log.hadoopConf)
      val e = intercept[IllegalStateException](log.compactLog(1, 3))
      assert(e.getMessage.contains("cannot model"), e.getMessage)
      assert(!fs.exists(FileNames.compactedFile(log.logPath, 1, 3)),
        "no compacted file may exist after the abort")
      // read tolerance is unchanged: the table still replays
      DeltaLog.clearCache()
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 4)
    }
  }

  test("a compacted-only tail anchors the segment timestamp on the " +
      "preserved CommitInfo, not the compacted file's mtime") {
    withTempDir { dir =>
      DeltaTable.write(Seq((0, "base")).toDF("v", "who"), dir)
      (1 to 4).foreach(i =>
        DeltaTable.write(Seq((i, s"c$i")).toDF("v", "who"), dir))
      val log = DeltaLog.forTable(spark, dir)
      val trueTs = log.getCommitInfoAt(4).timestamp.get
      val f = log.compactLog(1, 4)
      val fs = log.logPath.getFileSystem(log.hadoopConf)
      // a foreign cleanup removed the plain tail; the compaction ran a
      // day later, so the compacted file's mtime is NOT the commit time
      (1 to 4).foreach(v =>
        fs.delete(FileNames.deltaFile(log.logPath, v), false))
      fs.setTimes(f, trueTs + 86400000L, -1)
      DeltaLog.clearCache()
      val snap = DeltaLog.forTable(spark, dir).update()
      assert(snap.version == 4)
      assert(snap.timestamp == trueTs,
        s"expected commit time $trueTs, got ${snap.timestamp} " +
          s"(mtime would be ${trueTs + 86400000L})")
    }
  }

  test("OPTIMIZE LOG SQL: explicit range, post-checkpoint default, " +
      "no-op on a short tail, replay equality without originals") {
    withTempDir { dir =>
      DeltaTable.write(Seq((0, "base")).toDF("v", "who"), dir)
      (1 to 4).foreach(i =>
        DeltaTable.write(Seq((i, s"c$i")).toDF("v", "who"), dir))
      val log = DeltaLog.forTable(spark, dir)

      // explicit range
      val r = spark.sql(s"OPTIMIZE LOG '$dir' BETWEEN 1 AND 3").collect()
      assert(r.head.getLong(1) == 1L && r.head.getLong(2) == 3L)
      val f13 = FileNames.compactedFile(log.logPath, 1, 3)
      assert(log.logPath.getFileSystem(log.hadoopConf).exists(f13))

      // range beyond the tip refuses
      val e = intercept[IllegalArgumentException](
        spark.sql(s"OPTIMIZE LOG '$dir' BETWEEN 1 AND 99").collect())
      assert(e.getMessage.contains("beyond the latest version"))

      // default = the whole post-checkpoint tail (no checkpoint yet: 0..4)
      val d = spark.sql(s"OPTIMIZE LOG '$dir'").collect()
      assert(d.head.getLong(1) == 0L && d.head.getLong(2) == 4L)

      // replay equality through the compacted range alone
      val before = DeltaTable.forPath(spark, dir).toDF
        .as[(Int, String)].collect().toSet
      val fs = log.logPath.getFileSystem(log.hadoopConf)
      (0 to 4).foreach(v =>
        fs.delete(FileNames.deltaFile(log.logPath, v), false))
      DeltaLog.clearCache()
      assert(DeltaTable.forPath(spark, dir).toDF
        .as[(Int, String)].collect().toSet == before)

      // post-checkpoint default: checkpoint at 5, commits 6..7 -> 6..7
      DeltaTable.write(Seq((5, "c5")).toDF("v", "who"), dir)
      Checkpoints.writeCheckpoint(DeltaLog.forTable(spark, dir).update())
      DeltaTable.write(Seq((6, "c6")).toDF("v", "who"), dir)
      DeltaTable.write(Seq((7, "c7")).toDF("v", "who"), dir)
      DeltaLog.clearCache()
      val d2 = spark.sql(s"OPTIMIZE LOG '$dir'").collect()
      assert(d2.head.getLong(1) == 6L && d2.head.getLong(2) == 7L)

      // a tail of one commit has nothing to compact: no-op, not an error
      DeltaTable.write(Seq((8, "c8")).toDF("v", "who"), dir)
      Checkpoints.writeCheckpoint(DeltaLog.forTable(spark, dir).update())
      DeltaLog.clearCache()
      val d3 = spark.sql(s"OPTIMIZE LOG '$dir'").collect()
      assert(d3.head.getLong(1) == -1L && d3.head.getLong(2) == -1L)
    }
  }
}
