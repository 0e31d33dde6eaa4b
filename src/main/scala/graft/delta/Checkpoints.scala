package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Encoders, SaveMode}

/** `_last_checkpoint` contents (ref: Checkpoints.scala:54-101). */
case class LastCheckpoint(version: Long, size: Long, parts: Option[Int] = None)

/** Checkpoint write/read (SURVEY §2.1 M7/M8).
  *
  * A checkpoint is the snapshot's folded state (protocol, metadata, txns,
  * active files, unexpired tombstones) as parquet, written every
  * `checkpointInterval` commits so readers replay at most one checkpoint
  * plus a bounded number of JSON commits. The state is written as a Spark
  * job (scales to any file count), then the single part file is renamed to
  * the protocol's `N.checkpoint.parquet` name; `_last_checkpoint` is
  * updated last (overwrite, best-effort — corrupted hints are repaired by
  * listing, ref Checkpoints.scala:110-210).
  */
object Checkpoints {

  private def checkpointPolicy(snapshot: Snapshot): String =
    DeltaConfigs.CHECKPOINT_POLICY.fromMetadata(snapshot.metadata)

  /** Transaction identifiers a checkpoint must still carry. The protocol
    * lets writers expire them ("Transaction Identifiers"), and delta-spark
    * does so at checkpoint time when
    * `delta.setTransactionRetentionDuration` is set — without expiry a
    * per-file ingest tracker (COPY INTO) or a long-lived streaming appId
    * set grows the checkpoint forever. Expiry needs PROOF of age: a txn
    * without `lastUpdated` is kept unconditionally. Unset (the default)
    * keeps everything. */
  private[delta] def liveSetTransactions(
      snapshot: Snapshot): Seq[SetTransaction] = {
    val cutoff = snapshot.metadata.configuration
      .get("delta.setTransactionRetentionDuration")
      .map(DeltaConfigs.parseIntervalMillis)
      .map(ms => snapshot.deltaLog.clock() - ms)
    cutoff match {
      case None => snapshot.setTransactions
      case Some(c) =>
        snapshot.setTransactions.filter(_.lastUpdated.forall(_ >= c))
    }
  }

  /** Per-file stats a checkpoint writes, from the delta-spark
    * properties `delta.checkpoint.writeStatsAsStruct` /
    * `writeStatsAsJson` (both default true here: the struct is the
    * pruning fast path, the JSON is the interchange form). At 100 TB the
    * stats ARE the bulk of a checkpoint's bytes — turning the JSON
    * duplicate off roughly halves them while every reader keeps pruning
    * from the struct ([[read.DataSkipping]] and the metadata-only
    * aggregate both prefer `stats_parsed`). Turning BOTH off is legal
    * (delta-spark allows it): checkpoint-loaded files then carry no
    * stats, and every stats consumer falls back to scanning — the
    * documented cost, spec-pinned. Captures only the two booleans so the
    * function can ride into the distributed checkpoint job's closure. */
  private[delta] def statsTransform(metadata: Metadata): AddFile => AddFile = {
    val asStruct = metadata.configuration
      .get("delta.checkpoint.writeStatsAsStruct").forall(_.toBoolean)
    val asJson = metadata.configuration
      .get("delta.checkpoint.writeStatsAsJson").forall(_.toBoolean)
    (a: AddFile) => {
      val withStruct =
        if (asStruct) read.DataSkipping.withParsedStats(a)
        else a.copy(stats_parsed = None)
      if (asJson) withStruct else withStruct.copy(stats = None)
    }
  }

  /** Write the snapshot's checkpoint; `parts > 1` produces the protocol's
    * multi-part form `V.checkpoint.i.n.parquet` (one Spark output
    * partition per part — at very large file counts no single writer task
    * or reader task handles the whole state). Tables with
    * `delta.checkpointPolicy=v2` get a V2 (uuid-named) checkpoint with
    * sidecars instead — multi-part classic checkpoints are not legal
    * under that policy. */
  def writeCheckpoint(snapshot: Snapshot, parts: Int = 1): Unit = {
    if (checkpointPolicy(snapshot) == "v2") return writeV2Checkpoint(snapshot, parts)
    implicit val enc = Encs.singleAction
    val statsXf = statsTransform(snapshot.metadata)
    val actions: Seq[SingleAction] =
      (snapshot.protocol.wrap +: snapshot.metadata.wrap +:
        liveSetTransactions(snapshot).map(_.wrap)) ++
        snapshot.domainActions.map(_.wrap) ++
        // stats parse ONCE at checkpoint time; every later pruning query
        // reads the stats_parsed struct instead of re-walking the JSON
        snapshot.allFiles.map(a => statsXf(a).wrap) ++
        snapshot.tombstones.map(_.wrap)
    writeCheckpointDS(snapshot, snapshot.spark.createDataset(actions),
      actions.size.toLong, autoParts(snapshot, parts, actions.size.toLong),
      driverRows = Some(actions))
  }

  /** Fully distributed variant: the AddFile set comes from the
    * distributed log replay (M3) and flows into the checkpoint parquet as
    * a Spark job — the table's file list never materializes on the
    * driver. Protocol/metadata/txns/tombstones are driver-small by
    * construction. */
  def writeCheckpointDistributed(snapshot: Snapshot, parts: Int = 1): Unit = {
    if (checkpointPolicy(snapshot) == "v2") return writeV2Checkpoint(snapshot, parts)
    implicit val enc = Encs.singleAction
    val statsXf = statsTransform(snapshot.metadata)
    val small: Seq[SingleAction] =
      (snapshot.protocol.wrap +: snapshot.metadata.wrap +:
        liveSetTransactions(snapshot).map(_.wrap)) ++
        snapshot.domainActions.map(_.wrap) ++
        snapshot.tombstones.map(_.wrap)
    val ds = snapshot.spark.createDataset(small)
      .unionByName(snapshot.allFilesDistributed
        .map(a => statsXf(a).wrap)(
          Encs.singleAction))
    // the action count is an aggregation over the (persisted) distributed
    // state — the file list itself never touches the driver
    val total = small.size.toLong + snapshot.numOfFiles
    writeCheckpointDS(snapshot, ds, total, autoParts(snapshot, parts, total))
  }

  /** V2 checkpoint write (`delta.checkpointPolicy=v2`): the file actions
    * flow as Spark jobs into sidecar parquets under
    * `_delta_log/_sidecars/`, and a single uuid-named main parquet
    * carries `checkpointMetadata`, protocol, metadata, txns and the
    * sidecar references. Works in both driver and distributed state modes
    * (the file list never touches the driver in the latter).
    *
    * '''Sidecar carry-over''' — the reason the V2 format exists. Adds are
    * bucketed by a stable hash of their (canonicalized) path, one bucket
    * range per sidecar, with the bucket encoded in the sidecar's NAME
    * (`<uuid>.b<i>of<n>.<j>.parquet`). The next checkpoint re-references
    * every sidecar whose bucket no commit in the interval touched and
    * rewrites only the touched buckets — at 100 TB (millions of
    * AddFiles, checkpoint every 10 commits) this turns the largest
    * recurring metadata cost from O(table) into O(churn). Tombstones are
    * TIME-expiring, so they never carry over: they live in their own
    * `<uuid>.tombstones.<j>.parquet` sidecars, rewritten from the
    * snapshot each checkpoint so expiry keeps its cadence. Log cleanup
    * stays safe because it already keeps any sidecar referenced by a
    * surviving main file ([[DeltaLog.cleanUpExpiredLogs]]).
    *
    * Carry-over degrades to a full rewrite whenever its premises fail
    * ([[planV2CarryOver]]): a foreign/pre-carry-over previous checkpoint,
    * a metadata or protocol change in the interval (the stats form or
    * schema the carried files were written under may have changed), an
    * explicit part-count raise, or buckets grown past 2x the target part
    * size (rebucket).
    *
    * Concurrent writers need no publish claim here (unlike the classic
    * multi-part path): every V2 main and sidecar is uuid-named, so two
    * processes checkpointing the same version produce two disjoint,
    * individually-complete checkpoints — a reader selects one main and
    * sees only that writer's files; `_last_checkpoint` is a last-wins
    * atomic overwrite. */
  def writeV2Checkpoint(snapshot: Snapshot, parts: Int = 1): Unit = {
    implicit val enc = Encs.singleAction
    import org.apache.spark.sql.functions.{col, lit, udf}
    val statsXf = statsTransform(snapshot.metadata)
    val log = snapshot.deltaLog
    val fs = log.logPath.getFileSystem(log.hadoopConf)
    val spark = snapshot.spark

    val total = snapshot.numOfFiles + snapshot.tombstones.size
    // DRIVER-SMALL v2 checkpoint (r16, guide §1 profile): the action set
    // is already a driver Seq and each artifact is a KB-sized file, yet
    // the job path paid one full Spark write job per artifact class
    // (sidecars, tombstones, main) — 0.5-0.9 s per cadence checkpoint of
    // scaffolding. Same bytes via LocalParquet, same names, same publish
    // protocol; distributed-state (and non-local-scheme) tables keep the
    // Spark-job path unchanged.
    val driverSmall = !snapshot.distributedState &&
      "file".equalsIgnoreCase(Option(log.logPath.toUri.getScheme)
        .getOrElse(fs.getUri.getScheme)) &&
      total <= graft.delta.write.LocalParquet.MaxDriverRows
    lazy val adds =
      if (snapshot.distributedState)
        snapshot.allFilesDistributed.map(a => statsXf(a).wrap)(enc)
      else spark.createDataset(snapshot.allFiles.map(a => statsXf(a).wrap))

    val plan = planV2CarryOver(snapshot, parts)
    // full-rewrite bucket count: driven by the SIDECAR size target, not
    // the classic part size — finer buckets are what make carry-over
    // worth anything below millions of files
    val sidecarSize =
      DeltaConfigs.CHECKPOINT_SIDECAR_SIZE.fromMetadata(snapshot.metadata)
    val nBuckets = plan.map(_.nBuckets).getOrElse(math.max(parts,
      math.ceil(snapshot.numOfFiles.toDouble / sidecarSize.toDouble)
        .toInt.max(1)))

    val uuid = java.util.UUID.randomUUID().toString
    val tempDir = new Path(log.logPath, s".v2cp_tmp_$uuid")
    val sidecarDir = FileNames.sidecarDir(log.logPath)
    // bucket on the CANONICAL path: foreign logs legally mix relative and
    // absolute spellings of the same file, and a remove spelled
    // differently from its add must still land in the add's bucket
    val canonical = snapshot.canonicalPath
    val nb = nBuckets
    try {
      fs.mkdirs(sidecarDir)
      def publish(src: Path, destName: String): SidecarFile = {
        val dest = new Path(sidecarDir, destName)
        fs.delete(dest, false)
        if (!fs.rename(src, dest)) {
          throw new java.io.IOException(s"rename $src -> $dest failed")
        }
        val st = fs.getFileStatus(dest)
        SidecarFile(dest.getName, sizeInBytes = Some(st.getLen),
          modificationTime = Some(st.getModificationTime))
      }
      // 1. bucketed add sidecars: one file per (changed) bucket.
      val newBucketSidecars = if (driverSmall) {
        // rows already driver-resident: bucket with the SAME function,
        // write each changed bucket via LocalParquet (identical rows and
        // schema — partitionBy dropped __bucket on the job path too),
        // publish under the same names
        val changed = plan.map(_.changed.toSet)
        snapshot.allFiles.map(a => statsXf(a).wrap)
          .groupBy(sa => sidecarBucket(canonical(sa.add.get.path), nb))
          .toSeq.sortBy(_._1)
          .filter { case (b, _) => changed.forall(_.contains(b)) }
          .map { case (b, rows) =>
            val tmp = new Path(tempDir, s"b$b.parquet")
            graft.delta.write.LocalParquet.write(spark, tmp.toString, rows,
              Encs.singleAction)
            publish(tmp, s"$uuid.b${b}of$nBuckets.0.parquet")
          }
      } else {
        val bucketOf = udf((p: String) => sidecarBucket(canonical(p), nb))
        val bucketed = adds.toDF
          .withColumn("__bucket", bucketOf(col("add.path")))
        val toWrite = plan match {
          case Some(p) if p.changed.isEmpty => bucketed.filter(lit(false))
          case Some(p) => bucketed.filter(
            col("__bucket").isInCollection(p.changed))
          case None => bucketed
        }
        // one directory per (changed) bucket. The repartition keys every
        // bucket's rows into ONE task (bucket collisions inside a task
        // are fine — partitionBy still splits them into their own
        // directories), so each bucket rewrite produces exactly one
        // sidecar instead of one file per input partition that happened
        // to hold a row of it.
        val writeParts = plan.map(p => math.max(1, p.changed.size))
          .getOrElse(nBuckets)
        toWrite.repartition(writeParts, col("__bucket"))
          .write.partitionBy("__bucket")
          .mode(SaveMode.Overwrite).parquet(tempDir.toString)
        fs.listStatus(tempDir)
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("__bucket="))
          .sortBy(_.getPath.getName).flatMap { d =>
            val b = d.getPath.getName.stripPrefix("__bucket=").toInt
            fs.listStatus(d.getPath).map(_.getPath)
              .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
              .zipWithIndex.map { case (part, j) =>
                publish(part, s"$uuid.b${b}of$nBuckets.$j.parquet")
              }
          }.toSeq
      }
      // 2. tombstone sidecars: rewritten from the snapshot every time so
      // retention-based expiry is applied on the checkpoint cadence
      val tombstoneSidecars =
        if (snapshot.tombstones.isEmpty) Seq.empty[SidecarFile]
        else if (driverSmall) {
          val tmp = new Path(tempDir, "tombstones.parquet")
          graft.delta.write.LocalParquet.write(spark, tmp.toString,
            snapshot.tombstones.map(_.wrap), Encs.singleAction)
          Seq(publish(tmp, s"$uuid.tombstones.0.parquet"))
        } else {
          val tsDir = new Path(log.logPath, s".v2cp_ts_tmp_$uuid")
          val tParts = autoParts(snapshot, 1, snapshot.tombstones.size.toLong)
          spark.createDataset(snapshot.tombstones.map(_.wrap))
            .repartition(tParts)
            .write.mode(SaveMode.Overwrite).parquet(tsDir.toString)
          try fs.listStatus(tsDir).map(_.getPath)
            .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
            .zipWithIndex.map { case (part, j) =>
              publish(part, s"$uuid.tombstones.$j.parquet")
            }.toSeq
          finally fs.delete(tsDir, true)
        }
      val sidecars =
        (plan.map(_.carried).getOrElse(Seq.empty) ++ newBucketSidecars ++
          tombstoneSidecars).sortBy(_.path)

      // 2. main file: exactly one checkpointMetadata + the non-file
      // actions + the sidecar references
      implicit val mainEnc = Encs.v2MainAction
      val mainRows: Seq[Checkpoints.V2MainAction] =
        Checkpoints.V2MainAction(checkpointMetadata =
          Some(CheckpointMetadata(snapshot.version))) +:
        Checkpoints.V2MainAction(protocol = Some(snapshot.protocol)) +:
        Checkpoints.V2MainAction(metaData = Some(snapshot.metadata)) +:
        (liveSetTransactions(snapshot).map(t =>
          Checkpoints.V2MainAction(txn = Some(t))) ++
          snapshot.domainActions.map(d =>
            Checkpoints.V2MainAction(domainMetadata = Some(d))) ++
          sidecars.map(s => Checkpoints.V2MainAction(sidecar = Some(s))))
      // the main file's rows are a driver Seq by construction (non-file
      // actions + sidecar references) — on the local scheme write it
      // driver-side whatever the state mode; the temp+rename publish is
      // unchanged so readers never observe a torn main
      val localScheme = "file".equalsIgnoreCase(
        Option(log.logPath.toUri.getScheme).getOrElse(fs.getUri.getScheme))
      if (localScheme) {
        val mainTmp = new Path(tempDir, "main.parquet")
        graft.delta.write.LocalParquet.write(spark, mainTmp.toString,
          mainRows, Encs.v2MainAction)
        val dest = FileNames.v2CheckpointFile(
          log.logPath, snapshot.version, uuid, "parquet")
        fs.delete(dest, false)
        if (!fs.rename(mainTmp, dest)) {
          throw new java.io.IOException(s"rename $mainTmp -> $dest failed")
        }
      } else {
        val mainTmp = new Path(log.logPath, s".v2cp_main_tmp_$uuid")
        spark.createDataset(mainRows).coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(mainTmp.toString)
        try {
          val mainPart = fs.listStatus(mainTmp)
            .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
          val dest = FileNames.v2CheckpointFile(
            log.logPath, snapshot.version, uuid, "parquet")
          fs.delete(dest, false)
          if (!fs.rename(mainPart, dest)) {
            throw new java.io.IOException(s"rename $mainPart -> $dest failed")
          }
        } finally fs.delete(mainTmp, true)
      }

      val lc = LastCheckpoint(snapshot.version,
        total + mainRows.size.toLong, parts = None)
      log.store.write(FileNames.lastCheckpointFile(log.logPath),
        Iterator(JsonCodec.mapper.writeValueAsString(lc)),
        overwrite = true, log.hadoopConf)
    } finally {
      fs.delete(tempDir, true)
    }
  }

  /** One add-bucket sidecar name this writer produces:
    * `<uuid>.b<bucket>of<nBuckets>.<j>.parquet`. The bucket geometry
    * lives in the NAME so the next checkpoint's planner recovers the
    * manifest from the previous main file alone — no side channel a
    * foreign reader could misread (to them these are opaque sidecars). */
  private val BucketSidecarName = """.*\.b(\d+)of(\d+)\.\d+\.parquet""".r
  private val TombstoneSidecarName = """.*\.tombstones\.\d+\.parquet""".r

  /** Stable bucket of one (canonicalized) file path. Java's
    * `String.hashCode` is pinned by its spec, so the same path lands in
    * the same bucket in every JVM and session — the invariant carry-over
    * rests on. */
  private[delta] def sidecarBucket(path: String, nBuckets: Int): Int =
    math.floorMod(path.hashCode, nBuckets)

  private[delta] case class V2CarryPlan(
      nBuckets: Int,
      /** Previous-checkpoint sidecars re-referenced verbatim. */
      carried: Seq[SidecarFile],
      /** Buckets a commit in the interval touched — rewritten from the
        * current state (a touched bucket whose files all vanished simply
        * produces no sidecar). */
      changed: Set[Int])

  /** Decide whether this checkpoint can carry unchanged sidecars over
    * from the previous one; `None` = full rewrite. See
    * [[writeV2Checkpoint]] for the policy rationale. */
  private[delta] def planV2CarryOver(
      snapshot: Snapshot, requestedParts: Int): Option[V2CarryPlan] = {
    val main = snapshot.v2Main.getOrElse(return None)
    val prevV = snapshot.logSegment.checkpointVersion.getOrElse(return None)
    val buckets = Vector.newBuilder[(Int, Int, SidecarFile)]
    main.sidecars.foreach { s =>
      val name = V2Checkpoints.sidecarPath(snapshot.deltaLog.logPath, s).getName
      name match {
        case BucketSidecarName(b, n) => buckets += ((b.toInt, n.toInt, s))
        case TombstoneSidecarName() => // rewritten every checkpoint
        case _ => return None // foreign / pre-carry-over layout
      }
    }
    val parsed = buckets.result()
    if (parsed.isEmpty) return None
    val ns = parsed.map(_._2).distinct
    if (ns.size != 1) return None
    val nBuckets = ns.head
    val sidecarSize =
      DeltaConfigs.CHECKPOINT_SIDECAR_SIZE.fromMetadata(snapshot.metadata)
    if (requestedParts > nBuckets ||
        snapshot.numOfFiles > 2L * sidecarSize * nBuckets) return None
    // One STREAMING pass over the interval (nothing parsed is retained —
    // a backfill commit since the last checkpoint can carry 500k+ adds,
    // and caching them driver-side just to plan a checkpoint would be
    // the exact materialization the state bound exists to prevent):
    //  - a metadata/protocol change forces a full rewrite (it may alter
    //    the stats form or schema the carried files were written under;
    //    both are rare, so rewriting on them costs nothing steady-state);
    //  - add/remove paths mark their buckets changed.
    val canonical = snapshot.canonicalPath
    var metaOrProtoChanged = false
    val changedB = Set.newBuilder[Int]
    snapshot.lightCommitActionsAfter(prevV).foreach { case (_, as) =>
      as.foreach {
        case _: Metadata | _: Protocol => metaOrProtoChanged = true
        case a: AddFile =>
          changedB += sidecarBucket(canonical(a.path), nBuckets)
        case r: RemoveFile =>
          changedB += sidecarBucket(canonical(r.path), nBuckets)
        case _ =>
      }
    }
    if (metaOrProtoChanged) return None
    val changed = changedB.result()
    Some(V2CarryPlan(nBuckets,
      parsed.collect { case (b, _, s) if !changed.contains(b) => s },
      changed))
  }

  /** The larger of the caller/config-requested part count and the
    * SIZE-derived one: states beyond `delta.checkpoint.partSize` actions
    * split automatically so no single writer or reader task owns the
    * whole state (M7 auto-sizing, the `checkpointParts` semantics of the
    * reference generalized to derive from state size). */
  private def autoParts(snapshot: Snapshot, requested: Int,
                        actionCount: Long): Int = {
    val partSize =
      DeltaConfigs.CHECKPOINT_PART_SIZE.fromMetadata(snapshot.metadata)
    math.max(requested,
      math.ceil(actionCount.toDouble / partSize.toDouble).toInt.max(1))
  }

  /** How long a crashed publisher's claim marker blocks re-election.
    * Readers only ever select COMPLETE checkpoint groups, so a
    * half-published group behind a stale marker is invisible — reclaim
    * just restores writability of that version's checkpoint. */
  private[delta] val PublishClaimGraceMs: Long = 10 * 60 * 1000L

  /** O_EXCL marker create. On file:// the Hadoop local FS create is
    * check-then-act, so the kernel primitive does the electing (the same
    * hole the commit path closes in ObjectStoreLogStore). */
  private def atomicCreateMarker(fs: org.apache.hadoop.fs.FileSystem,
                                 p: Path): Boolean =
    try {
      if (Option(p.toUri.getScheme).forall(_ == "file")) {
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(p.toUri.getPath))
      } else {
        val out = fs.create(p, false)
        out.close()
      }
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case e: java.io.IOException => if (fs.exists(p)) false else throw e
    }

  /** Elect ONE publisher for this version's checkpoint group. A stale
    * claim (crashed winner) is reclaimed after the grace period. */
  // private[delta] so the reclaim-race spec can drive it directly
  private[delta] def claimPublish(fs: org.apache.hadoop.fs.FileSystem,
                                  marker: Path): Boolean =
    atomicCreateMarker(fs, marker) || {
      try {
        val st = fs.getFileStatus(marker)
        val instance = st.getModificationTime
        if (System.currentTimeMillis() - instance > PublishClaimGraceMs) {
          reclaimStaleClaim(fs, marker, instance)
        } else false
      } catch {
        // the holder finished and removed it between our create and stat
        case _: java.io.FileNotFoundException => atomicCreateMarker(fs, marker)
      }
    }

  /** Reclaim a stale claim ATOMICALLY. Plain delete-then-create lets two
    * reclaimers interleave — B's delete removes A's freshly re-created
    * marker and both claims succeed, the exact mixed-part-set hazard the
    * marker enforces against (ADVICE r13). Two guards close it:
    *
    *  1. an O_EXCL reclaim TICKET named by the stale instance's mtime —
    *     at most one reclaimer per stale instance ever passes (create is
    *     the one FS primitive with no overwrite/TOCTOU ambiguity; two
    *     instances can't share an mtime, they are >= a grace period
    *     apart);
    *  2. a re-stat immediately before the delete verifying the marker is
    *     STILL that instance — a late reclaimer that re-acquires the
    *     ticket after the winner released it sees the winner's fresh
    *     mtime and backs off without deleting.
    *
    * The ticket is released in `finally`; one leaks only on JVM death
    * mid-reclaim, and a leaked ticket older than the grace period is
    * swept (returning false — the sweeper unwedges the version for the
    * NEXT caller rather than racing onward itself). Residual windows all
    * require a process pausing LONGER than the 10-minute grace at a
    * specific line — the irreducible lease hazard of any crash-reclaim
    * scheme without a lock service. */
  private def reclaimStaleClaim(fs: org.apache.hadoop.fs.FileSystem,
                                marker: Path, instance: Long): Boolean = {
    val ticket = new Path(marker.getParent,
      s"${marker.getName}.reclaim.$instance")
    if (!atomicCreateMarker(fs, ticket)) {
      // another reclaimer owns this instance — or its JVM died holding
      // the ticket: sweep a grace-old ticket so the version cannot stay
      // wedged forever behind a crashed reclaimer
      try {
        val tst = fs.getFileStatus(ticket)
        if (System.currentTimeMillis() - tst.getModificationTime >
            PublishClaimGraceMs) {
          fs.delete(ticket, false)
        }
      } catch { case _: java.io.FileNotFoundException => () }
      return false
    }
    try {
      val stillStale =
        try fs.getFileStatus(marker).getModificationTime == instance
        catch { case _: java.io.FileNotFoundException => false }
      if (!stillStale) false
      else {
        fs.delete(marker, false)
        atomicCreateMarker(fs, marker)
      }
    } finally fs.delete(ticket, false)
  }

  private def writeCheckpointDS(
      snapshot: Snapshot,
      actionsDS: org.apache.spark.sql.Dataset[SingleAction],
      knownSize: Long,
      parts: Int,
      driverRows: Option[Seq[SingleAction]] = None): Unit = {
    require(parts >= 1, s"parts must be >= 1, got $parts")
    val log = snapshot.deltaLog
    val fs = log.logPath.getFileSystem(log.hadoopConf)

    val tempDir = new Path(log.logPath,
      s".checkpoint_tmp_${java.util.UUID.randomUUID()}")
    // DRIVER-SMALL single-part checkpoint (r16, guide §1 profile): the
    // rows are already a driver Seq and the output is one KB-sized file —
    // write it with LocalParquet (same WriteSupport/schema/codec as the
    // one-task job, none of the job/committer/chmod scaffolding, measured
    // 0.3-0.9 s per cadence checkpoint). The publish protocol below
    // (claim marker, rename, _last_checkpoint) is unchanged.
    val local = "file".equalsIgnoreCase(
      Option(log.logPath.toUri.getScheme).getOrElse(fs.getUri.getScheme))
    val wroteDriverSide = driverRows match {
      case Some(rows) if parts == 1 && local &&
          rows.size <= graft.delta.write.LocalParquet.MaxDriverRows =>
        graft.delta.write.LocalParquet.write(snapshot.spark,
          new Path(tempDir, "part-00000.parquet").toString, rows,
          Encs.singleAction)
        true
      case _ => false
    }
    if (!wroteDriverSide) {
      // parts == 1 (the steady-state cadence checkpoint): coalesce instead
      // of repartition — one task, NO shuffle exchange (guide §2.4; the
      // round-robin repartition additionally paid sortBeforeRepartition).
      // Multi-part keeps repartition: even part sizes need the shuffle.
      val shaped =
        if (parts == 1) actionsDS.coalesce(1) else actionsDS.repartition(parts)
      shaped.write.mode(SaveMode.Overwrite).parquet(tempDir.toString)
    }
    try {
      val written = fs.listStatus(tempDir)
        .map(_.getPath).filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      require(written.nonEmpty, "checkpoint write produced no parquet")
      // CONCURRENT-WRITER GUARD (VERDICT r12 #3): publishing a
      // (possibly multi-part) group is not atomic — two processes
      // explicitly checkpointing the SAME version could interleave
      // delete+rename over the same destinations and mix parts from two
      // different row distributions of the state (losing/duplicating
      // rows). An O_EXCL claim marker elects ONE publisher per version;
      // the loser abandons its staged parts — a checkpoint for this
      // version is being (or was) written, which is the outcome its
      // caller asked for. The automatic cadence path could never reach
      // the interleave (NOTES r12), but the public API can: this turns
      // that adjudication into enforcement (CrossProcessCheckpointSpec).
      val marker = new Path(log.logPath,
        "." + "%020d".format(snapshot.version) + ".checkpoint.publishing")
      if (!claimPublish(fs, marker)) return
      try {
        val dests =
          if (parts == 1) {
            Seq(FileNames.checkpointFileSingular(log.logPath, snapshot.version))
          } else {
            // a near-empty state can yield fewer Spark partitions than parts
            FileNames.checkpointFileWithParts(
              log.logPath, snapshot.version, written.length)
          }
        written.zip(dests).foreach { case (part, dest) =>
          fs.delete(dest, false) // idempotent re-checkpoint
          if (!fs.rename(part, dest)) {
            throw new java.io.IOException(s"rename $part -> $dest failed")
          }
        }
        val lc = LastCheckpoint(snapshot.version, knownSize,
          parts = Some(written.length).filter(_ > 1))
        log.store.write(FileNames.lastCheckpointFile(log.logPath),
          Iterator(JsonCodec.mapper.writeValueAsString(lc)),
          overwrite = true, log.hadoopConf)
      } finally {
        try fs.delete(marker, false)
        catch { case _: java.io.IOException => () }
      }
    } finally {
      fs.delete(tempDir, true)
    }
  }

  /** Row shape of a V2 checkpoint's MAIN parquet file: the non-file
    * action columns plus `checkpointMetadata` and `sidecar` (top-level —
    * Spark's generated serializer must reach the constructor). */
  private[delta] case class V2MainAction(
      txn: Option[SetTransaction] = None,
      metaData: Option[Metadata] = None,
      protocol: Option[Protocol] = None,
      checkpointMetadata: Option[CheckpointMetadata] = None,
      sidecar: Option[SidecarFile] = None,
      domainMetadata: Option[DomainMetadata] = None)

  /** Read `_last_checkpoint`; any failure (missing, corrupt) yields None
    * and the caller falls back to a full listing. */
  def lastCheckpoint(log: DeltaLog): Option[LastCheckpoint] =
    try {
      val lines = log.store.read(
        FileNames.lastCheckpointFile(log.logPath), log.hadoopConf)
      lines.headOption.map(
        JsonCodec.mapper.readValue(_, classOf[LastCheckpoint]))
    } catch { case _: Exception => None }
}
