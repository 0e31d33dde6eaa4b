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
    implicit val enc = Encoders.product[SingleAction]
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
      actions.size.toLong, autoParts(snapshot, parts, actions.size.toLong))
  }

  /** Fully distributed variant: the AddFile set comes from the
    * distributed log replay (M3) and flows into the checkpoint parquet as
    * a Spark job — the table's file list never materializes on the
    * driver. Protocol/metadata/txns/tombstones are driver-small by
    * construction. */
  def writeCheckpointDistributed(snapshot: Snapshot, parts: Int = 1): Unit = {
    if (checkpointPolicy(snapshot) == "v2") return writeV2Checkpoint(snapshot, parts)
    implicit val enc = Encoders.product[SingleAction]
    val statsXf = statsTransform(snapshot.metadata)
    val small: Seq[SingleAction] =
      (snapshot.protocol.wrap +: snapshot.metadata.wrap +:
        liveSetTransactions(snapshot).map(_.wrap)) ++
        snapshot.domainActions.map(_.wrap) ++
        snapshot.tombstones.map(_.wrap)
    val ds = snapshot.spark.createDataset(small)
      .unionByName(snapshot.allFilesDistributed
        .map(a => statsXf(a).wrap)(
          Encoders.product[SingleAction]))
    // the action count is an aggregation over the (persisted) distributed
    // state — the file list itself never touches the driver
    val total = small.size.toLong + snapshot.numOfFiles
    writeCheckpointDS(snapshot, ds, total, autoParts(snapshot, parts, total))
  }

  /** V2 checkpoint write (`delta.checkpointPolicy=v2`): the file actions
    * (adds with parsed stats + unexpired tombstones) flow as a Spark job
    * into sidecar parquets under `_delta_log/_sidecars/` — the same
    * distributed shape as the classic multi-part write, one output
    * partition per sidecar — and a single uuid-named main parquet carries
    * `checkpointMetadata`, protocol, metadata, txns and the sidecar
    * references. Works in both driver and distributed state modes (the
    * file list never touches the driver in the latter). */
  def writeV2Checkpoint(snapshot: Snapshot, parts: Int = 1): Unit = {
    implicit val enc = Encoders.product[SingleAction]
    val statsXf = statsTransform(snapshot.metadata)
    val log = snapshot.deltaLog
    val fs = log.logPath.getFileSystem(log.hadoopConf)
    val spark = snapshot.spark

    val fileActions =
      (if (snapshot.distributedState)
        snapshot.allFilesDistributed
          .map(a => statsXf(a).wrap)(enc)
      else spark.createDataset(
        snapshot.allFiles.map(a => statsXf(a).wrap)))
        .unionByName(spark.createDataset(snapshot.tombstones.map(_.wrap)))
    val total = snapshot.numOfFiles + snapshot.tombstones.size
    val nParts = autoParts(snapshot, parts, total)

    // 1. sidecars: one parquet per output partition, uuid-named
    val uuid = java.util.UUID.randomUUID().toString
    val tempDir = new Path(log.logPath, s".v2cp_tmp_$uuid")
    fileActions.repartition(nParts)
      .write.mode(SaveMode.Overwrite).parquet(tempDir.toString)
    try {
      val written = fs.listStatus(tempDir)
        .map(_.getPath).filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      val sidecarDir = FileNames.sidecarDir(log.logPath)
      fs.mkdirs(sidecarDir)
      val sidecars = written.zipWithIndex.map { case (part, i) =>
        val dest = new Path(sidecarDir, s"$uuid-$i.parquet")
        fs.delete(dest, false)
        if (!fs.rename(part, dest)) {
          throw new java.io.IOException(s"rename $part -> $dest failed")
        }
        val st = fs.getFileStatus(dest)
        SidecarFile(dest.getName, sizeInBytes = Some(st.getLen),
          modificationTime = Some(st.getModificationTime))
      }.toSeq

      // 2. main file: exactly one checkpointMetadata + the non-file
      // actions + the sidecar references
      implicit val mainEnc = Encoders.product[Checkpoints.V2MainAction]
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

      val lc = LastCheckpoint(snapshot.version,
        total + mainRows.size.toLong, parts = None)
      log.store.write(FileNames.lastCheckpointFile(log.logPath),
        Iterator(JsonCodec.mapper.writeValueAsString(lc)),
        overwrite = true, log.hadoopConf)
    } finally {
      fs.delete(tempDir, true)
    }
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

  private def writeCheckpointDS(
      snapshot: Snapshot,
      actionsDS: org.apache.spark.sql.Dataset[SingleAction],
      knownSize: Long,
      parts: Int): Unit = {
    require(parts >= 1, s"parts must be >= 1, got $parts")
    val log = snapshot.deltaLog
    val fs = log.logPath.getFileSystem(log.hadoopConf)

    val tempDir = new Path(log.logPath,
      s".checkpoint_tmp_${java.util.UUID.randomUUID()}")
    actionsDS.repartition(parts)
      .write.mode(SaveMode.Overwrite).parquet(tempDir.toString)
    try {
      val written = fs.listStatus(tempDir)
        .map(_.getPath).filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      require(written.nonEmpty, "checkpoint write produced no parquet")
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
