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

  def writeCheckpoint(snapshot: Snapshot): Unit = {
    val log = snapshot.deltaLog
    val spark = snapshot.spark
    val fs = log.logPath.getFileSystem(log.hadoopConf)

    val actions: Seq[SingleAction] =
      (snapshot.protocol.wrap +: snapshot.metadata.wrap +:
        snapshot.setTransactions.map(_.wrap)) ++
        snapshot.allFiles.map(_.wrap) ++
        snapshot.tombstones.map(_.wrap)

    implicit val enc = Encoders.product[SingleAction]
    val tempDir = new Path(log.logPath,
      s".checkpoint_tmp_${java.util.UUID.randomUUID()}")
    spark.createDataset(actions).repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(tempDir.toString)
    try {
      val part = fs.listStatus(tempDir)
        .map(_.getPath).find(_.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException("checkpoint write produced no parquet"))
      val dest = FileNames.checkpointFileSingular(log.logPath, snapshot.version)
      fs.delete(dest, false) // idempotent re-checkpoint
      if (!fs.rename(part, dest)) {
        throw new java.io.IOException(s"rename $part -> $dest failed")
      }
      val lc = LastCheckpoint(snapshot.version, actions.size.toLong)
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
