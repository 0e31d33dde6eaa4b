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

  /** Write the snapshot's checkpoint; `parts > 1` produces the protocol's
    * multi-part form `V.checkpoint.i.n.parquet` (one Spark output
    * partition per part — at very large file counts no single writer task
    * or reader task handles the whole state). */
  def writeCheckpoint(snapshot: Snapshot, parts: Int = 1): Unit = {
    implicit val enc = Encoders.product[SingleAction]
    val actions: Seq[SingleAction] =
      (snapshot.protocol.wrap +: snapshot.metadata.wrap +:
        snapshot.setTransactions.map(_.wrap)) ++
        // stats parse ONCE at checkpoint time; every later pruning query
        // reads the stats_parsed struct instead of re-walking the JSON
        snapshot.allFiles.map(a => read.DataSkipping.withParsedStats(a).wrap) ++
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
    implicit val enc = Encoders.product[SingleAction]
    val small: Seq[SingleAction] =
      (snapshot.protocol.wrap +: snapshot.metadata.wrap +:
        snapshot.setTransactions.map(_.wrap)) ++
        snapshot.tombstones.map(_.wrap)
    val ds = snapshot.spark.createDataset(small)
      .unionByName(snapshot.allFilesDistributed
        .map(a => read.DataSkipping.withParsedStats(a).wrap)(
          Encoders.product[SingleAction]))
    // the action count is an aggregation over the (persisted) distributed
    // state — the file list itself never touches the driver
    val total = small.size.toLong + snapshot.numOfFiles
    writeCheckpointDS(snapshot, ds, total, autoParts(snapshot, parts, total))
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
