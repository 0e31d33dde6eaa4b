package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tools.FileCountScale

/** The distributed-state invariant at REAL file counts (VERDICT r11 #1):
  * every prior proof ran at <=4k ghost AddFiles, while a 100 TB table
  * carries 10^5-10^6. This drives the full metadata lifecycle over a
  * synthetic log of 100k AddFiles (log-only ghosts — touching one fails
  * loudly on the missing parquet) and asserts the claim the 100 TB design
  * rests on: the file list NEVER materializes on the driver —
  *
  *   - replay + file count (pre-checkpoint: a huge JSON tail must route
  *     distributed even with NO checkpoint — the byte bound counts tail
  *     commits since r12, not checkpoint bytes alone);
  *   - the light fold must not retain the tail's AddFiles at all
  *     (r12: in distributed mode adds stream through the fold for their
  *     tombstone-cancel side effect only — O(tombstones) driver memory);
  *   - classic multi-part checkpoint write + replay through it;
  *   - V2 (uuid + sidecar) checkpoint write + replay through it;
  *   - log compaction of the add-range + replay through the compacted
  *     range alone;
  *   - partition- and stats-pruned scans, scan-API survivor collection;
  *   - OPTIMIZE candidate selection, VACUUM LITE, history().
  *
  * Timings/heap across file counts live in NOTES.md (FileCountScale main
  * measures the files-axis ratio at 50k vs 500k); this spec pins the
  * INVARIANTS at 100k inside the suite. */
class FileCountScaleSpec extends SparkSpec {
  import spark.implicits._

  private val N = 100000

  /** Planned file count straight off the relation's file index — a
    * streaming DataFrame cannot answer `inputFiles` (batch-only check). */
  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.logical.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.length
          case _ => 0
        }
    }.sum

  test("100k AddFiles: the file list never materializes on the driver " +
      "through replay, checkpoints, pruning, OPTIMIZE, VACUUM, history") {
    withTempDir { dir =>
      spark.conf.set(Snapshot.DriverStateMaxBytesKey, "1")
      try {
        FileCountScale.synthesize(spark, dir, N)

        // ---- cold replay, NO checkpoint yet: a 100k-add JSON tail must
        // route distributed (the pre-r12 bound looked at checkpoint bytes
        // only and would fold all 100k adds on the driver here)
        DeltaLog.clearCache()
        val log = DeltaLog.forTable(spark, dir)
        val snap0 = log.update()
        assert(snap0.distributedState,
          "checkpoint-less huge tail must route distributed")
        assert(snap0.metadata.partitionColumns == Seq("p"))
        assert(snap0.numOfFiles == N + 1)
        assert(!snap0.fullStateComputed,
          "pre-checkpoint count folded the file list on the driver")
        assert(!snap0.filesMaterialized)

        // the light fold ran (metadata access) but must NOT have retained
        // the tail's file metadata: tombstone-cancel keys only
        assert(snap0.tombstones.isEmpty)

        // ---- classic multi-part checkpoint, then replay through it
        Checkpoints.writeCheckpointDistributed(snap0, parts = 4)
        DeltaLog.clearCache()
        val snap1 = DeltaLog.forTable(spark, dir).update()
        assert(snap1.logSegment.checkpointVersion.contains(snap0.version))
        assert(snap1.numOfFiles == N + 1)
        assert(!snap1.fullStateComputed && !snap1.filesMaterialized)

        // ---- partition-pruned scan: only p=real exists on disk
        assert(snap1.toDF.filter($"p" === "real")
          .agg(sum($"v")).as[Long].head() ==
          (1 to FileCountScale.RealRows).sum)
        assert(!snap1.filesMaterialized,
          "partition-pruned scan collected the full file list")

        // ---- stats-pruned scan: v above every max -> zero files read
        assert(snap1.toDF.filter($"v" > N + 100000).count() == 0L)
        assert(!snap1.filesMaterialized)

        // ---- scan API: driver receives survivors only
        val survivors =
          DeltaTable.forPath(spark, dir).scan($"p" === "real").getFiles
        assert(survivors.nonEmpty &&
          survivors.forall(_.partitionValues("p") == "real"))
        assert(!snap1.filesMaterialized)

        // ---- OPTIMIZE candidate selection (ghosts oversized, excluded
        // inside the pruning job; only p=real compacts)
        DeltaTable.forPath(spark, dir).compact()
        assert(!snap1.filesMaterialized,
          "OPTIMIZE candidate selection collected the full file list")
        val afterOpt = log.update()
        assert(afterOpt.numOfFiles == N + 1) // real files -> 1, ghosts kept

        // ---- VACUUM LITE + history stay metadata-only
        DeltaTable.forPath(spark, dir).vacuum(dryRun = true, lite = true)
        assert(log.history().nonEmpty)
        assert(!afterOpt.fullStateComputed && !afterOpt.filesMaterialized)

        // ---- V2 checkpoint (uuid main + sidecars), replay through it
        Checkpoints.writeV2Checkpoint(afterOpt, parts = 4)
        DeltaLog.clearCache()
        val snapV2 = DeltaLog.forTable(spark, dir).update()
        assert(snapV2.logSegment.checkpointVersion.contains(afterOpt.version))
        assert(snapV2.numOfFiles == N + 1)
        assert(snapV2.toDF.filter($"p" === "real")
          .agg(sum($"v")).as[Long].head() ==
          (1 to FileCountScale.RealRows).sum)
        assert(!snapV2.fullStateComputed && !snapV2.filesMaterialized)

        // ---- log compaction across the 100k-add range; replay must
        // cover 1..10 through the compacted file alone once the plain
        // commits and checkpoints are gone
        log.compactLog(1, snap0.version)
        val fs = log.logPath.getFileSystem(log.hadoopConf)
        (1L to snap0.version).foreach(v =>
          fs.delete(FileNames.deltaFile(log.logPath, v), false))
        fs.delete(
          new org.apache.hadoop.fs.Path(log.logPath, "_last_checkpoint"),
          false)
        fs.globStatus(new org.apache.hadoop.fs.Path(log.logPath,
          "*checkpoint*")).foreach(st => fs.delete(st.getPath, true))
        fs.delete(
          new org.apache.hadoop.fs.Path(log.logPath, "_sidecars"), true)
        DeltaLog.clearCache()
        val snapC = DeltaLog.forTable(spark, dir).update()
        assert(snapC.distributedState)
        assert(snapC.numOfFiles == N + 1)
        assert(snapC.toDF.filter($"p" === "real")
          .agg(sum($"v")).as[Long].head() ==
          (1 to FileCountScale.RealRows).sum)
        assert(!snapC.fullStateComputed && !snapC.filesMaterialized,
          "compacted-range replay materialized the file list")
      } finally {
        spark.conf.unset(Snapshot.DriverStateMaxBytesKey)
      }
    }
  }

  test("100k-add backfill commit through the streaming source: admission " +
      "chunks WITHIN the giant version, batches stay O(budget), CDF is " +
      "version-granular, nothing materializes snapshot state") {
    withTempDir { dir =>
      import org.apache.spark.sql.connector.read.streaming.ReadLimit
      spark.conf.set(Snapshot.DriverStateMaxBytesKey, "1")
      try {
        val budget = 10000
        // ONE giant commit (the CONVERT/backfill shape), ICT on so the
        // start-position timestamp path exercises the first-line parse
        FileCountScale.synthesize(spark, dir, N, nCommits = 1,
          extraConfig = Map("delta.enableInCommitTimestamps" -> "true"))
        DeltaLog.clearCache()
        val log = DeltaLog.forTable(spark, dir)
        val src = new graft.delta.streaming.DeltaSource(spark.sqlContext,
          log, Map("startingVersion" -> "1",
            "maxFilesPerTrigger" -> budget.toString))
        var prev: org.apache.spark.sql.connector.read.streaming.Offset = null
        var batches = 0
        var planned = 0L
        var subVersionOffsets = 0
        var done = false
        while (!done) {
          val end = src.latestOffset(prev, ReadLimit.maxFiles(budget))
          if (end == null || (prev != null && end.json == prev.json)) {
            done = true
          } else {
            if (end.json.contains("index")) subVersionOffsets += 1
            val n = plannedFiles(src.getBatch(
              Option(prev).map(_.asInstanceOf[
                org.apache.spark.sql.execution.streaming.Offset]),
              end.asInstanceOf[
                org.apache.spark.sql.execution.streaming.Offset]))
            assert(n <= budget, s"batch planned $n files > budget $budget")
            planned += n
            batches += 1
            prev = end
          }
        }
        assert(batches == N / budget,
          s"expected ${N / budget} chunked batches, got $batches")
        assert(subVersionOffsets == N / budget - 1,
          "every non-final chunk must be a sub-version offset")
        assert(prev.json == "1",
          s"the final offset must normalize to the bare version: ${prev.json}")
        assert(planned == N, s"chunks covered $planned of $N files")
        // the walk never touches snapshot file state
        val snap = log.update()
        assert(!snap.fullStateComputed && !snap.filesMaterialized,
          "the streaming walk materialized snapshot state")

        // restart recovery: a mid-version offset round-trips through its
        // JSON (the offset-log path) and the next chunk resumes exactly
        val src2 = new graft.delta.streaming.DeltaSource(spark.sqlContext,
          log, Map("startingVersion" -> "1",
            "maxFilesPerTrigger" -> budget.toString))
        val first = src2.latestOffset(null, ReadLimit.maxFiles(budget))
        assert(first.json == s"""{"version":1,"index":$budget}""")
        val resumed = src2.latestOffset(
          new graft.delta.streaming.DeltaSourceOffset(1L, budget.toLong),
          ReadLimit.maxFiles(budget))
        assert(resumed.json == s"""{"version":1,"index":${2 * budget}}""")

        // CDF over the PURE-add backfill commit chunks exactly like the
        // non-CDF path (derived-insert slices are well-defined); complex
        // versions (cdc files / removes) still clamp to the boundary —
        // ChangeDataFeedSpec covers those
        val cdfSrc = new graft.delta.streaming.DeltaSource(spark.sqlContext,
          log, Map("startingVersion" -> "1", "readChangeFeed" -> "true"))
        var cdfPrev: org.apache.spark.sql.connector.read.streaming.Offset =
          null
        var cdfBatches = 0
        var cdfPlanned = 0L
        var cdfDone = false
        while (!cdfDone) {
          val e = cdfSrc.latestOffset(cdfPrev, ReadLimit.maxFiles(budget))
          if (e == null || (cdfPrev != null && e.json == cdfPrev.json)) {
            cdfDone = true
          } else {
            val n = plannedFiles(cdfSrc.getBatch(
              Option(cdfPrev).map(_.asInstanceOf[
                org.apache.spark.sql.execution.streaming.Offset]),
              e.asInstanceOf[
                org.apache.spark.sql.execution.streaming.Offset]))
            assert(n <= budget, s"CDF batch planned $n files > $budget")
            cdfPlanned += n
            cdfBatches += 1
            cdfPrev = e
          }
        }
        assert(cdfBatches == N / budget,
          s"CDF must chunk the pure-add commit: $cdfBatches batches")
        assert(cdfPlanned == N, s"CDF chunks covered $cdfPlanned of $N")

        // start-position resolution over the ICT log (first-line parse)
        assert(log.getVersionAtOrAfterTimestamp(0L) == 0L)

        // conflict detection against the giant winner STREAMS: a blind
        // append pinned before the backfill commit collides with it,
        // validates against all 100k winning adds, and lands — without
        // materializing snapshot state (asserted below on a fresh update)
        val txn = new graft.delta.txn.OptimisticTransaction(
          log, log.getSnapshotForVersionAsOf(0))
        txn.commit(Seq(AddFile("p=real/xconflict.parquet",
          Map("p" -> "real"), 1L, 1L, dataChange = true)),
          DeltaOperations.ManualUpdate)
        val after = log.update()
        assert(after.version == 2L,
          "the retried commit must land right after the giant winner")
        assert(!after.fullStateComputed && !after.filesMaterialized)
      } finally {
        spark.conf.unset(Snapshot.DriverStateMaxBytesKey)
      }
    }
  }

  test("100k-file INITIAL SNAPSHOT through the streaming source: the " +
      "no-startingVersion first batch chunks as N/budget snapshot-offset " +
      "batches, resumes mid-snapshot, never materializes driver state") {
    withTempDir { dir =>
      import org.apache.spark.sql.connector.read.streaming.ReadLimit
      spark.conf.set(Snapshot.DriverStateMaxBytesKey, "1")
      try {
        val budget = 10000
        FileCountScale.synthesize(spark, dir, N)
        DeltaLog.clearCache()
        val log = DeltaLog.forTable(spark, dir)
        val headV = log.update().version
        // NO startingVersion: the whole 100k-file snapshot is the first
        // thing this stream serves — pre-r14 it was one giant batch
        val src = new graft.delta.streaming.DeltaSource(spark.sqlContext,
          log, Map("maxFilesPerTrigger" -> budget.toString))
        var prev: org.apache.spark.sql.connector.read.streaming.Offset = null
        var batches = 0
        var planned = 0L
        var snapshotOffsets = 0
        var done = false
        while (!done) {
          val end = src.latestOffset(prev, ReadLimit.maxFiles(budget))
          if (end == null || (prev != null && end.json == prev.json)) {
            done = true
          } else {
            if (end.json.contains("\"snapshot\":true")) snapshotOffsets += 1
            val n = plannedFiles(src.getBatch(
              Option(prev).map(_.asInstanceOf[
                org.apache.spark.sql.execution.streaming.Offset]),
              end.asInstanceOf[
                org.apache.spark.sql.execution.streaming.Offset]))
            assert(n <= budget, s"batch planned $n files > budget $budget")
            planned += n
            batches += 1
            prev = end
          }
        }
        // the snapshot = N ghost adds + synthesize's one real file
        val total = N + 1
        val expectBatches = (total + budget - 1) / budget
        assert(batches == expectBatches,
          s"expected $expectBatches snapshot chunks, got $batches")
        assert(snapshotOffsets == expectBatches - 1,
          "every non-final chunk must be a snapshot offset")
        assert(prev.json == headV.toString,
          s"the drain must end at the bare pinned version: ${prev.json}")
        assert(planned == total, s"chunks covered $planned of $total files")
        val snap = log.update()
        assert(!snap.filesMaterialized,
          "the snapshot drain materialized the file list on the driver")

        // restart recovery: a fresh source resumes from a mid-snapshot
        // offset parsed back from its JSON (the offset-log path) and the
        // rank order is rebuilt identically
        val src2 = new graft.delta.streaming.DeltaSource(spark.sqlContext,
          log, Map("maxFilesPerTrigger" -> budget.toString))
        val first = src2.latestOffset(null, ReadLimit.maxFiles(budget))
        assert(first.json ==
          s"""{"version":$headV,"index":$budget,"snapshot":true}""")
        val resumed = src2.latestOffset(
          graft.delta.streaming.DeltaSourceOffset.parse(
            s"""{"version":$headV,"index":${3 * budget},"snapshot":true}"""),
          ReadLimit.maxFiles(budget))
        assert(resumed.json ==
          s"""{"version":$headV,"index":${4 * budget},"snapshot":true}""")
        // the resumed chunk plans exactly the [3b, 4b) slice
        val n2 = plannedFiles(src2.getBatch(
          Some(graft.delta.streaming.DeltaSourceOffset(
            headV, 3L * budget, isSnapshot = true)),
          resumed.asInstanceOf[
            org.apache.spark.sql.execution.streaming.Offset]))
        assert(n2 == budget, s"resumed chunk planned $n2 files")
      } finally {
        spark.conf.unset(Snapshot.DriverStateMaxBytesKey)
      }
    }
  }

  test("100k-cdc-file DML commit through the CDF stream: admission chunks " +
      "by cdc index, batches stay O(budget), nothing materializes state") {
    withTempDir { dir =>
      import org.apache.spark.sql.connector.read.streaming.ReadLimit
      spark.conf.set(Snapshot.DriverStateMaxBytesKey, "1")
      try {
        val budget = 10000
        FileCountScale.synthesize(spark, dir, 100, nCommits = 1,
          extraConfig = Map("delta.enableChangeDataFeed" -> "true"))
        DeltaLog.clearCache()
        val log = DeltaLog.forTable(spark, dir)
        // ONE giant DML-shaped commit: adds + dataChange removes + N cdc
        // files — the single-UPDATE-over-everything shape whose CDF
        // output alone exceeded any per-trigger bound before r14
        val adds = (1 to 50).map(i => AddFile(
          s"p=ghost0/dml-$i.parquet", Map("p" -> "ghost0"), 1L, 1L,
          dataChange = true))
        val removes = (1 to 50).map(i => RemoveFile(
          s"p=ghost1/part-0-$i.parquet", Some(1L), dataChange = true,
          partitionValues = Some(Map("p" -> "ghost1")), size = Some(1L)))
        val cdcs = (1 to N).map(i => AddCDCFile(
          s"p=ghost${i % 50}/cdc-$i.parquet",
          Map("p" -> s"ghost${i % 50}"), 1024L))
        log.startTransaction().commit(adds ++ removes ++ cdcs,
          DeltaOperations.ManualUpdate)
        val dmlV = log.update().version

        val src = new graft.delta.streaming.DeltaSource(spark.sqlContext,
          log, Map("startingVersion" -> dmlV.toString,
            "readChangeFeed" -> "true"))
        var prev: org.apache.spark.sql.connector.read.streaming.Offset = null
        var batches = 0
        var planned = 0L
        var subVersionOffsets = 0
        var done = false
        while (!done) {
          val end = src.latestOffset(prev, ReadLimit.maxFiles(budget))
          if (end == null || (prev != null && end.json == prev.json)) {
            done = true
          } else {
            if (end.json.contains("index")) subVersionOffsets += 1
            val n = plannedFiles(src.getBatch(
              Option(prev).map(_.asInstanceOf[
                org.apache.spark.sql.execution.streaming.Offset]),
              end.asInstanceOf[
                org.apache.spark.sql.execution.streaming.Offset]))
            assert(n <= budget, s"CDF batch planned $n files > $budget")
            planned += n
            batches += 1
            prev = end
          }
        }
        assert(batches == N / budget,
          s"expected ${N / budget} cdc chunks, got $batches")
        assert(subVersionOffsets == N / budget - 1,
          "every non-final cdc chunk must be a sub-version offset")
        assert(prev.json == dmlV.toString,
          s"the drain must end at the bare version: ${prev.json}")
        assert(planned == N, s"cdc chunks covered $planned of $N files")
        val snap = log.update()
        assert(!snap.filesMaterialized,
          "the cdc walk materialized the file list on the driver")

        // restart recovery: a mid-version cdc offset round-trips and the
        // next chunk resumes at exactly the recorded cdc index
        val src2 = new graft.delta.streaming.DeltaSource(spark.sqlContext,
          log, Map("startingVersion" -> dmlV.toString,
            "readChangeFeed" -> "true"))
        val resumed = src2.latestOffset(
          graft.delta.streaming.DeltaSourceOffset.parse(
            s"""{"version":$dmlV,"index":${3 * budget}}"""),
          ReadLimit.maxFiles(budget))
        assert(resumed.json ==
          s"""{"version":$dmlV,"index":${4 * budget}}""")

        // a 100k-remove DELETE-ONLY commit (partition delete / retention
        // shape) chunks by remove index the same way
        val rms = (1 to N).map(i => RemoveFile(
          s"p=ghost${i % 50}/part-0-$i.parquet", Some(1L),
          dataChange = true,
          partitionValues = Some(Map("p" -> s"ghost${i % 50}")),
          size = Some(1L)))
        log.startTransaction().commit(rms, DeltaOperations.ManualUpdate)
        val rmV = log.update().version
        val rmSrc = new graft.delta.streaming.DeltaSource(spark.sqlContext,
          log, Map("startingVersion" -> rmV.toString,
            "readChangeFeed" -> "true"))
        var rmPrev: org.apache.spark.sql.connector.read.streaming.Offset =
          null
        var rmBatches = 0
        var rmPlanned = 0L
        var rmDone = false
        while (!rmDone) {
          val end = rmSrc.latestOffset(rmPrev, ReadLimit.maxFiles(budget))
          if (end == null || (rmPrev != null && end.json == rmPrev.json)) {
            rmDone = true
          } else {
            val n = plannedFiles(rmSrc.getBatch(
              Option(rmPrev).map(_.asInstanceOf[
                org.apache.spark.sql.execution.streaming.Offset]),
              end.asInstanceOf[
                org.apache.spark.sql.execution.streaming.Offset]))
            assert(n <= budget, s"remove batch planned $n files > $budget")
            rmPlanned += n
            rmBatches += 1
            rmPrev = end
          }
        }
        assert(rmBatches == N / budget,
          s"expected ${N / budget} remove chunks, got $rmBatches")
        assert(rmPlanned == N, s"remove chunks covered $rmPlanned of $N")
        assert(rmPrev.json == rmV.toString)
      } finally {
        spark.conf.unset(Snapshot.DriverStateMaxBytesKey)
      }
    }
  }

  test("light fold of a huge tail retains NO AddFiles (adds fold for " +
      "their tombstone-cancel side effect only)") {
    withTempDir { dir =>
      spark.conf.set(Snapshot.DriverStateMaxBytesKey, "1")
      try {
        // small count — this test pins the CANCELLATION semantics the
        // no-retention fold must keep exact; the run above pins scale
        FileCountScale.synthesize(spark, dir, 1000)
        DeltaLog.clearCache()
        val snap = DeltaLog.forTable(spark, dir).update()
        assert(snap.distributedState)
        snap.metadata // force the light fold
        // the stripped light fold must still be EXACT where it matters:
        // an add after a remove of the same path cancels the tombstone
        val log = DeltaLog.forTable(spark, dir)
        val ghost = AddFile(
          path = "p=ghost0/part-0-50.parquet",
          partitionValues = Map("p" -> "ghost0"),
          size = 10L * 1024 * 1024 * 1024, modificationTime = 1L,
          dataChange = true,
          stats = Some("""{"numRecords":10,"minValues":{"v":1},""" +
            """"maxValues":{"v":1},"nullCount":{"v":0}}"""))
        log.startTransaction().commit(
          Seq(ghost.remove(dataChange = true)), DeltaOperations.ManualUpdate)
        log.startTransaction().commit(
          Seq(ghost), DeltaOperations.ManualUpdate)
        DeltaLog.clearCache()
        val snap2 = DeltaLog.forTable(spark, dir).update()
        assert(snap2.distributedState)
        assert(!snap2.tombstones.exists(_.path == ghost.path),
          "re-add must cancel the tombstone in the stripped light fold")
        assert(snap2.numOfFiles == 1001)
        assert(!snap2.fullStateComputed && !snap2.filesMaterialized)
      } finally {
        spark.conf.unset(Snapshot.DriverStateMaxBytesKey)
      }
    }
  }
}
