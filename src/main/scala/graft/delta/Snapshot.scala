package graft.delta

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** The contiguous slice of the log that defines one table version:
  * an optional checkpoint plus every commit after it.
  * Ref: SnapshotManagement.scala:316-328. */
case class LogSegment(
    logPath: Path,
    version: Long,
    deltas: Seq[FileStatus],
    checkpoint: Seq[FileStatus],
    checkpointVersion: Option[Long],
    lastCommitTimestamp: Long)

object LogSegment {
  def empty(logPath: Path): LogSegment =
    LogSegment(logPath, -1, Nil, Nil, None, 0L)
}

/** Immutable table state at one version (ref: SnapshotImpl.scala:67-346).
  *
  * Log replay reads the checkpoint (parquet, via Spark — already
  * distributed) and the JSON commits after it (driver-side: there are at
  * most `checkpointInterval` of them, bounded-size by construction — see
  * BASELINE.md "snapshot refresh cost bound").
  */
class Snapshot(
    val spark: SparkSession,
    val deltaLog: DeltaLog,
    val version: Long,
    val logSegment: LogSegment,
    val minFileRetentionTimestamp: Long,
    val timestamp: Long) {

  lazy val state: State = {
    val replay = new InMemoryLogReplay(minFileRetentionTimestamp)
    // Checkpoint first — it IS the folded state at checkpointVersion.
    logSegment.checkpointVersion.foreach { cpVersion =>
      val paths = logSegment.checkpoint.map(_.getPath.toString)
      implicit val enc = Encoders.product[SingleAction]
      val cpActions = spark.read.schema(enc.schema).parquet(paths: _*)
        .as[SingleAction].collect().iterator.map(_.unwrap).filter(_ != null)
      replay.append(cpVersion, cpActions)
    }
    // ...then the JSON commits after it, in ascending version order.
    logSegment.deltas.foreach { fs =>
      replay.append(FileNames.deltaVersion(fs.getPath), readCommit(fs))
    }
    replay.state
  }

  private def readCommit(fs: FileStatus): Iterator[Action] =
    deltaLog.store.read(fs.getPath, deltaLog.hadoopConf).iterator
      .filter(_.trim.nonEmpty)
      .map(JsonCodec.actionFromJson)
      .filter(_ != null)

  def protocol: Protocol = state.protocol
  def metadata: Metadata = state.metadata
  def allFiles: Seq[AddFile] = state.activeFiles
  def tombstones: Seq[RemoveFile] = state.tombstones
  def setTransactions: Seq[SetTransaction] = state.setTransactions
  def numOfFiles: Long = state.numOfFiles
  def sizeInBytes: Long = state.sizeInBytes

  /** Stream-idempotence lookup (ref: SnapshotImpl.scala txn map). */
  def transactionVersion(appId: String): Option[Long] =
    state.setTransactions.find(_.appId == appId).map(_.version)

  /** Active files as a Dataset — the distributed face of the state, used
    * for metadata queries and checkpoint writing at large file counts. */
  def allFilesDS: Dataset[AddFile] = {
    implicit val enc = Encoders.product[AddFile]
    spark.createDataset(state.activeFiles)
  }

  /** Active files via the distributed replay (M3) — same answer as
    * [[allFiles]], computed as a Spark job for beyond-driver-memory logs. */
  def allFilesDistributed: Dataset[AddFile] =
    DistributedLogReplay.activeFiles(this)

  /** Assemble the DataFrame for this snapshot (scan path, SURVEY §2.3). */
  def toDF: org.apache.spark.sql.DataFrame =
    new read.DeltaScanBuilder(this).buildDF(None)

  /** Validate we can read this table (ref: SnapshotImpl protocol check). */
  def assertReadable(): Unit = {
    require(protocol.minReaderVersion <= 1,
      s"Unsupported reader protocol version ${protocol.minReaderVersion}; " +
        "this engine implements reader version 1")
  }
}
