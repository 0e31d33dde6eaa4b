package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.delta._

/** File-count-axis scale harness (VERDICT r11 #1): the 100 TB design
  * claim rests on "the file list never materializes on the driver",
  * previously proven only at <=4k ghost AddFiles. This drives the whole
  * metadata lifecycle over a synthetic log of N AddFiles (log-only; no
  * parquet behind the ghosts, so any accidental data access fails loudly)
  * and reports wall time + retained driver heap per operation:
  *
  *   cold replay (light P&M state), distributed file count, classic
  *   multi-part checkpoint write + cold replay through it, V2 (uuid +
  *   sidecar) checkpoint write + cold replay through it, log compaction
  *   of the add-range + cold replay through the compacted range,
  *   partition-pruned scan, stats-pruned scan, scan-API survivor
  *   collection, OPTIMIZE candidate selection, VACUUM LITE (dry run),
  *   history().
  *
  * The spec twin (`FileCountScaleSpec`) asserts the invariants
  * (filesMaterialized / fullStateComputed stay false, results correct) at
  * 100k files; this main measures the files-axis ratio (e.g. 50k vs 500k)
  * for the NOTES table.
  *
  * Usage: runMain graft.tools.FileCountScale <workDir> <n1> [<n2> ...]
  */
object FileCountScale {

  case class OpTiming(op: String, millis: Long, heapMB: Long)

  val RealRows = 20

  /** Base table (partition p=real, v=1..20) + `nFiles` ghost AddFiles in
    * `nCommits` blind-append commits across 50 ghost partitions, each
    * with numRecords/min/max stats so stats pruning has something to
    * prune. Ghost sizes are 10 GiB so OPTIMIZE never selects them. */
  def synthesize(spark: SparkSession, dir: String, nFiles: Int,
                 nCommits: Int = 10,
                 extraConfig: Map[String, String] = Map.empty): Unit = {
    import spark.implicits._
    DeltaTable.write(
      (1 to RealRows).map(i => (i, "real")).toDF("v", "p").coalesce(1),
      dir, partitionBy = Seq("p"),
      // no automatic checkpoints: the drive times them explicitly
      configuration =
        Map("delta.checkpointInterval" -> "1000000") ++ extraConfig)
    val log = DeltaLog.forTable(spark, dir)
    val perCommit = nFiles / nCommits
    require(perCommit * nCommits == nFiles,
      s"nFiles=$nFiles must divide by nCommits=$nCommits")
    (0 until nCommits).foreach { c =>
      val adds = (1 to perCommit).map { i =>
        val id = c * perCommit + i
        AddFile(
          path = s"p=ghost${id % 50}/part-$c-$i.parquet",
          partitionValues = Map("p" -> s"ghost${id % 50}"),
          size = 10L * 1024 * 1024 * 1024,
          modificationTime = 1L, dataChange = true,
          stats = Some(s"""{"numRecords":10,"minValues":{"v":${id + 100}},""" +
            s""""maxValues":{"v":${id + 100}},"nullCount":{"v":0}}"""))
      }
      log.startTransaction().commit(adds, DeltaOperations.ManualUpdate)
    }
  }

  private def usedHeapMB(): Long = {
    System.gc(); Thread.sleep(50); System.gc()
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  /** Drive every metadata-lifecycle operation; returns per-op timings.
    * Uses ONLY the public API — the invariant asserts live in the spec. */
  def drive(spark: SparkSession, dir: String, nFiles: Int): Seq[OpTiming] = {
    import spark.implicits._
    val out = Vector.newBuilder[OpTiming]
    def timed[A](op: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      out += OpTiming(op, (System.nanoTime() - t0) / 1000000, usedHeapMB())
      r
    }
    def coldLog(): DeltaLog = {
      DeltaLog.clearCache()
      DeltaLog.forTable(spark, dir)
    }

    // 1. cold replay, light state only (P&M short-circuit)
    val snap0 = timed("cold replay (light P&M)") {
      val s = coldLog().update()
      require(s.metadata.partitionColumns == Seq("p")); s
    }
    // 2. distributed file count (aggregation over the replay job)
    timed("file count (distributed agg)") {
      require(snap0.numOfFiles == nFiles + 1,
        s"expected ${nFiles + 1} files, got ${snap0.numOfFiles}")
    }
    // 3. classic multi-part checkpoint write (distributed job). NOTE:
    // the table's row labels come from the FIRST count's op strings, so
    // keep this label count-independent
    val parts = math.max(2, nFiles / 50000)
    timed("classic checkpoint write (size-scaled parts)") {
      Checkpoints.writeCheckpointDistributed(snap0, parts)
    }
    // 4. cold replay THROUGH the classic checkpoint
    timed("cold replay via classic cp + count") {
      require(coldLog().update().numOfFiles == nFiles + 1)
    }
    // 5. partition-pruned scan: only p=real survives (and only its files
    //    exist on disk — touching a ghost file would throw)
    val log = coldLog()
    val snap = log.update()
    timed("partition-pruned scan + agg") {
      val s = snap.toDF.filter($"p" === "real")
        .agg(sum($"v")).as[Long].head()
      require(s == (1 to RealRows).sum, s"bad sum $s")
    }
    // 6. stats-pruned scan: v beyond every file's max -> zero survivors
    timed("stats-pruned scan (0 survivors)") {
      require(snap.toDF.filter($"v" > nFiles + RealRows + 1000).count() == 0L)
    }
    // 7. scan-API survivor collection (driver receives survivors only)
    timed("scan API survivors") {
      val files = DeltaTable.forPath(spark, dir).scan($"p" === "real").getFiles
      require(files.nonEmpty && files.forall(_.partitionValues("p") == "real"))
    }
    // 8. OPTIMIZE candidate selection (ghosts oversized -> excluded in
    //    the pruning job; only p=real compacts)
    timed("OPTIMIZE candidate selection") {
      DeltaTable.forPath(spark, dir).compact()
    }
    // 9. VACUUM LITE dry run (log-derived orphan set, no full listing)
    timed("VACUUM LITE (dry run)") {
      DeltaTable.forPath(spark, dir).vacuum(dryRun = true, lite = true)
    }
    // 10. history
    timed("history()") {
      require(coldLog().history().nonEmpty)
    }
    // 10b. VACUUM FULL: the distributed root/dir listing + the 500k-row
    //     active-set anti-join must stay Spark jobs (the r12 vacuum
    //     change removed the driver collect of the dir set — this is the
    //     axis that validates it). Ghost files have no bytes on disk, so
    //     the listing side is small while the ACTIVE side carries every
    //     ghost AddFile — nothing is deletable, and a nonzero count here
    //     means vacuum invented orphans
    timed("VACUUM FULL (dry run)") {
      require(DeltaTable.forPath(spark, dir).vacuum(dryRun = true) == 0)
    }
    timed("VACUUM FULL (delete pass)") {
      require(DeltaTable.forPath(spark, dir).vacuum() == 0)
    }
    // 11. V2 checkpoint (uuid main + sidecars) at the post-OPTIMIZE tip
    val snap2 = coldLog().update()
    timed("V2 checkpoint write (size-scaled sidecars)") {
      Checkpoints.writeV2Checkpoint(snap2, parts)
    }
    timed("cold replay via V2 cp + count") {
      // OPTIMIZE rewrote p=real (n real files -> 1), ghosts untouched
      require(coldLog().update().numOfFiles == nFiles + 1)
    }
    // 12. log compaction across the ghost-add range, then a cold replay
    //     that can only cover 1..nCommits through the compacted file:
    //     remove the plain commits AND the checkpoints
    val fs = log.logPath.getFileSystem(log.hadoopConf)
    timed("compactLog over add-range") {
      log.compactLog(1, snap0.version)
    }
    timed("cold replay via compacted range + count") {
      (1L to snap0.version).foreach(v =>
        fs.delete(FileNames.deltaFile(log.logPath, v), false))
      fs.delete(new org.apache.hadoop.fs.Path(log.logPath, "_last_checkpoint"),
        false)
      fs.globStatus(new org.apache.hadoop.fs.Path(log.logPath,
        "*checkpoint*")).foreach(st => fs.delete(st.getPath, true))
      fs.delete(new org.apache.hadoop.fs.Path(log.logPath, "_sidecars"), true)
      require(coldLog().update().numOfFiles == nFiles + 1)
    }
    out.result()
  }

  /** Compaction-cadence tier (VERDICT r11 #7): the same ghost ingest
    * with `graft.logCompaction.interval=2`, so the post-commit hook
    * writes a compacted range every 2 commits DURING the ingest —
    * compacted ranges are most valuable exactly when commits are
    * numerous. Reports the ingest overhead vs the plain twin and the
    * cold tail replay that now walks ranges instead of plain commits. */
  def cadenceDrive(spark: SparkSession, dir: String,
                   nFiles: Int): Seq[OpTiming] = {
    val out = Vector.newBuilder[OpTiming]
    def timed[A](op: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      out += OpTiming(op, (System.nanoTime() - t0) / 1000000, usedHeapMB())
      r
    }
    timed("ingest with interval=2 cadence") {
      synthesize(spark, dir, nFiles,
        extraConfig = Map("graft.logCompaction.interval" -> "2"))
    }
    val log = DeltaLog.forTable(spark, dir)
    val fs = log.logPath.getFileSystem(log.hadoopConf)
    val ranges = fs.listStatus(log.logPath)
      .map(_.getPath.getName).count(_.endsWith(".compacted.json"))
    require(ranges >= 4, s"cadence hook wrote only $ranges ranges")
    timed(s"cold replay via $ranges cadence ranges + count") {
      DeltaLog.clearCache()
      require(DeltaLog.forTable(spark, dir).update().numOfFiles == nFiles + 1)
    }
    out.result()
  }

  /** Streaming-source tier (VERDICT r12 #1): ONE giant backfill commit
    * drained through [[graft.delta.streaming.DeltaSource]] under
    * file-budget admission. Proves (a) the per-trigger driver footprint
    * is O(budget) — the heap column stays flat while draining a commit
    * many times the budget; (b) admission CHUNKS WITHIN the giant
    * version via sub-version offsets (not one unbounded batch, not a
    * stall); (c) the CDF batch over the same commit is version-granular
    * and plans through ≤2 relations with driver state bounded by the
    * tagged file list; (d) startingTimestamp resolution on an
    * ICT-enabled log stays flat in commit SIZE (first-line streaming
    * parse). Ghost adds have no parquet behind them, so the proof is
    * plan-level — any accidental data access fails loudly. */
  def streamingDrive(spark: SparkSession, dir: String,
                     nFiles: Int): Seq[OpTiming] = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    // planned file count off the relation's file index (a streaming
    // DataFrame cannot answer the batch-only inputFiles call)
    def plannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.logical.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.inputFiles.length
            case _ => 0
          }
      }.sum
    val out = Vector.newBuilder[OpTiming]
    def timed[A](op: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      out += OpTiming(op, (System.nanoTime() - t0) / 1000000, usedHeapMB())
      r
    }
    val budget = 10000
    require(nFiles % budget == 0, s"nFiles=$nFiles must divide by $budget")
    timed("ingest single-commit backfill (ICT on)") {
      synthesize(spark, dir, nFiles, nCommits = 1,
        extraConfig = Map("delta.enableInCommitTimestamps" -> "true"))
    }
    val log = DeltaLog.forTable(spark, dir)
    val src = new graft.delta.streaming.DeltaSource(spark.sqlContext, log,
      Map("startingVersion" -> "1", "maxFilesPerTrigger" -> budget.toString))
    var batches = 0
    var planned = 0L
    var maxBatch = 0
    var sawSubVersion = false
    timed("drain giant commit (chunked batches)") {
      var prev: org.apache.spark.sql.connector.read.streaming.Offset = null
      var done = false
      while (!done) {
        val end = src.latestOffset(prev, ReadLimit.maxFiles(budget))
        if (end == null || (prev != null && end.json == prev.json)) {
          done = true
        } else {
          if (end.json.contains("index")) sawSubVersion = true
          val endV1 = end.asInstanceOf[
            org.apache.spark.sql.execution.streaming.Offset]
          val prevV1 = Option(prev).map(_.asInstanceOf[
            org.apache.spark.sql.execution.streaming.Offset])
          val n = plannedFiles(src.getBatch(prevV1, endV1))
          require(n <= budget, s"batch planned $n files > budget $budget")
          maxBatch = math.max(maxBatch, n)
          planned += n
          batches += 1
          prev = end
        }
      }
      require(sawSubVersion,
        "admission never chunked within the giant version")
      require(batches == nFiles / budget,
        s"expected ${nFiles / budget} chunked batches, got $batches")
      require(planned == nFiles,
        s"chunks covered $planned of $nFiles files")
    }
    timed("CDF drain (pure-add commit, chunked)") {
      val cdfSrc = new graft.delta.streaming.DeltaSource(spark.sqlContext,
        log, Map("startingVersion" -> "1", "readChangeFeed" -> "true"))
      var prev: org.apache.spark.sql.connector.read.streaming.Offset = null
      var total = 0L
      var done = false
      while (!done) {
        val end = cdfSrc.latestOffset(prev, ReadLimit.maxFiles(budget))
        if (end == null || (prev != null && end.json == prev.json)) {
          done = true
        } else {
          val n = plannedFiles(cdfSrc.getBatch(
            Option(prev).map(_.asInstanceOf[
              org.apache.spark.sql.execution.streaming.Offset]),
            end.asInstanceOf[
              org.apache.spark.sql.execution.streaming.Offset]))
          require(n <= budget, s"CDF batch planned $n files > $budget")
          total += n
          prev = end
        }
      }
      require(total == nFiles, s"CDF chunks covered $total of $nFiles")
    }
    timed("startingTimestamp resolution (ICT log)") {
      require(log.getVersionAtOrAfterTimestamp(0L) == 0L)
    }
    timed("conflict check vs giant winning commit") {
      // a blind append pinned BEFORE the backfill commit collides with
      // it and must validate against all nFiles winning adds by
      // STREAMING them (the conflict checker folds to bounded state —
      // materializing the winner here was the last instance of the
      // tail-walker pin)
      val txn = new graft.delta.txn.OptimisticTransaction(
        log, log.getSnapshotForVersionAsOf(0))
      txn.commit(Seq(AddFile("p=real/xconflict.parquet",
        Map("p" -> "real"), 1L, 1L, dataChange = true)),
        DeltaOperations.ManualUpdate)
      require(log.update().version == 2L,
        "the retried commit must land after the giant winner")
    }
    // r14: the INITIAL snapshot of a no-startingVersion stream drains in
    // budget-bounded chunks over the sort-by-path cursor — the one batch
    // that used to be unsplittable (VERDICT r13 #1)
    timed("drain initial snapshot (chunked)") {
      val snapTotal = nFiles + 2L // ghosts + synthesize's real + conflict
      val snapSrc = new graft.delta.streaming.DeltaSource(spark.sqlContext,
        log, Map("maxFilesPerTrigger" -> budget.toString))
      var prev: org.apache.spark.sql.connector.read.streaming.Offset = null
      var total = 0L
      var batches = 0
      var sawSnapshotOffset = false
      var done = false
      while (!done) {
        val end = snapSrc.latestOffset(prev, ReadLimit.maxFiles(budget))
        if (end == null || (prev != null && end.json == prev.json)) {
          done = true
        } else {
          if (end.json.contains("\"snapshot\":true")) sawSnapshotOffset = true
          val n = plannedFiles(snapSrc.getBatch(
            Option(prev).map(_.asInstanceOf[
              org.apache.spark.sql.execution.streaming.Offset]),
            end.asInstanceOf[
              org.apache.spark.sql.execution.streaming.Offset]))
          require(n <= budget, s"snapshot batch planned $n files > $budget")
          total += n
          batches += 1
          prev = end
        }
      }
      require(sawSnapshotOffset, "the initial snapshot never chunked")
      require(batches == (snapTotal + budget - 1) / budget,
        s"expected ${(snapTotal + budget - 1) / budget} snapshot chunks, " +
          s"got $batches")
      require(total == snapTotal,
        s"snapshot chunks covered $total of $snapTotal files")
    }
    // r15: the same drain under a BYTE budget — per-trigger cuts come
    // from the precomputed cut chain (one streaming pass at cursor
    // build), not a head+count job pair per chunk (VERDICT r14 #4)
    timed("drain initial snapshot (byte budget, cut chain)") {
      val snapTotal = nFiles + 2L
      // ghosts are 10 GiB each: this budget admits ~`budget` per chunk
      val byteBudget = budget.toLong * 10L * 1024 * 1024 * 1024
      val snapSrc = new graft.delta.streaming.DeltaSource(spark.sqlContext,
        log, Map("maxBytesPerTrigger" -> byteBudget.toString))
      var prev: org.apache.spark.sql.connector.read.streaming.Offset = null
      var total = 0L
      var batches = 0
      var done = false
      while (!done) {
        val end = snapSrc.latestOffset(prev, snapSrc.getDefaultReadLimit)
        if (end == null || (prev != null && end.json == prev.json)) {
          done = true
        } else {
          val n = plannedFiles(snapSrc.getBatch(
            Option(prev).map(_.asInstanceOf[
              org.apache.spark.sql.execution.streaming.Offset]),
            end.asInstanceOf[
              org.apache.spark.sql.execution.streaming.Offset]))
          // the 2 tiny real files can pack into a ghost chunk
          require(n <= budget + 2,
            s"byte-budget snapshot batch planned $n files > ${budget + 2}")
          total += n
          batches += 1
          prev = end
        }
      }
      require(total == snapTotal,
        s"byte-budget snapshot chunks covered $total of $snapTotal files")
      require(batches >= snapTotal / budget,
        s"byte-budget drain used only $batches chunks")
    }
    // r14: a giant DML commit's CDF output (its AddCDCFiles) chunks by
    // cdc index through the same byte-offset memo (VERDICT r13 #3)
    timed("ingest giant cdc commit") {
      val adds = (1 to 10).map(i => AddFile(
        s"p=ghost0/dml-$i.parquet", Map("p" -> "ghost0"), 1L, 1L,
        dataChange = true))
      val removes = (1 to 10).map(i => RemoveFile(
        s"p=ghost1/part-0-$i.parquet", Some(1L), dataChange = true,
        partitionValues = Some(Map("p" -> "ghost1")), size = Some(1L)))
      val cdcs = (1 to nFiles).map(i => AddCDCFile(
        s"p=ghost${i % 50}/cdc-$i.parquet",
        Map("p" -> s"ghost${i % 50}"), 1024L))
      log.startTransaction().commit(adds ++ removes ++ cdcs,
        DeltaOperations.ManualUpdate)
    }
    timed("CDF drain giant cdc commit (chunked)") {
      val dmlV = log.update().version
      val cdfSrc = new graft.delta.streaming.DeltaSource(spark.sqlContext,
        log, Map("startingVersion" -> dmlV.toString,
          "readChangeFeed" -> "true"))
      var prev: org.apache.spark.sql.connector.read.streaming.Offset = null
      var total = 0L
      var batches = 0
      var done = false
      while (!done) {
        val end = cdfSrc.latestOffset(prev, ReadLimit.maxFiles(budget))
        if (end == null || (prev != null && end.json == prev.json)) {
          done = true
        } else {
          val n = plannedFiles(cdfSrc.getBatch(
            Option(prev).map(_.asInstanceOf[
              org.apache.spark.sql.execution.streaming.Offset]),
            end.asInstanceOf[
              org.apache.spark.sql.execution.streaming.Offset]))
          require(n <= budget, s"cdc batch planned $n files > $budget")
          total += n
          batches += 1
          prev = end
        }
      }
      require(batches == nFiles / budget,
        s"expected ${nFiles / budget} cdc chunks, got $batches")
      require(total == nFiles, s"cdc chunks covered $total of $nFiles")
    }
    // r14: a giant DELETE-ONLY commit's derived-delete feed chunks by
    // remove index — with this, every CDF version shape is O(budget)
    timed("ingest giant delete-only commit") {
      val rms = (1 to nFiles).map(i => RemoveFile(
        s"p=ghost${i % 50}/part-0-$i.parquet", Some(1L), dataChange = true,
        partitionValues = Some(Map("p" -> s"ghost${i % 50}")),
        size = Some(1L)))
      log.startTransaction().commit(rms, DeltaOperations.ManualUpdate)
    }
    timed("CDF drain giant delete-only commit (chunked)") {
      val rmV = log.update().version
      val rmSrc = new graft.delta.streaming.DeltaSource(spark.sqlContext,
        log, Map("startingVersion" -> rmV.toString,
          "readChangeFeed" -> "true"))
      var prev: org.apache.spark.sql.connector.read.streaming.Offset = null
      var total = 0L
      var batches = 0
      var done = false
      while (!done) {
        val end = rmSrc.latestOffset(prev, ReadLimit.maxFiles(budget))
        if (end == null || (prev != null && end.json == prev.json)) {
          done = true
        } else {
          val n = plannedFiles(rmSrc.getBatch(
            Option(prev).map(_.asInstanceOf[
              org.apache.spark.sql.execution.streaming.Offset]),
            end.asInstanceOf[
              org.apache.spark.sql.execution.streaming.Offset]))
          require(n <= budget, s"remove batch planned $n files > $budget")
          total += n
          batches += 1
          prev = end
        }
      }
      require(batches == nFiles / budget,
        s"expected ${nFiles / budget} remove chunks, got $batches")
      require(total == nFiles, s"remove chunks covered $total of $nFiles")
    }
    out.result()
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: FileCountScale <workDir> <nFiles1> [<nFiles2> ...]")
    val workDir = args(0)
    val counts = args.drop(1).map(_.toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-file-count-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // force the distributed state path regardless of checkpoint size —
    // the same switch the invariant specs use
    spark.conf.set(Snapshot.DriverStateMaxBytesKey, "1")

    // optional tier filter for iterating on one tier (e.g. "streaming")
    val tier = sys.env.get("SPARK_GRAFT_FCS_TIER")
    if (tier.contains("streaming")) {
      counts.foreach { n =>
        val st = streamingDrive(spark, s"$workDir/stream_$n", n)
        println()
        println(s"| streaming op (n=$n) | ms | heap MB |")
        println("|---|---|---|")
        st.foreach(t => println(s"| ${t.op} | ${t.millis} | ${t.heapMB} |"))
      }
      spark.stop()
      return
    }
    val results = counts.map { n =>
      val dir = s"$workDir/files_$n"
      val t0 = System.nanoTime()
      synthesize(spark, dir, n)
      val synthMs = (System.nanoTime() - t0) / 1000000
      println(s"== n=$n synthesized in ${synthMs} ms ==")
      n -> drive(spark, dir, n)
    }
    println()
    println("| op | " + results.map(r => s"${r._1} files (ms) | heap MB").mkString(" | ") + " |")
    println("|---|" + results.flatMap(_ => Seq("---", "---")).mkString("|") + "|")
    val ops = results.head._2.map(_.op)
    ops.zipWithIndex.foreach { case (op, i) =>
      val cells = results.map { case (_, ts) =>
        s"${ts(i).millis} | ${ts(i).heapMB}"
      }
      println(s"| $op | ${cells.mkString(" | ")} |")
    }
    // cadence tier at the largest count
    val nMax = counts.max
    val cad = cadenceDrive(spark, s"$workDir/cadence_$nMax", nMax)
    println()
    println(s"| cadence op (n=$nMax) | ms | heap MB |")
    println("|---|---|---|")
    cad.foreach(t => println(s"| ${t.op} | ${t.millis} | ${t.heapMB} |"))
    // streaming tier at every count (the ratio across counts is the
    // flat-footprint evidence)
    counts.foreach { n =>
      val st = streamingDrive(spark, s"$workDir/stream_$n", n)
      println()
      println(s"| streaming op (n=$n) | ms | heap MB |")
      println("|---|---|---|")
      st.foreach(t => println(s"| ${t.op} | ${t.millis} | ${t.heapMB} |"))
    }
    spark.stop()
  }
}
