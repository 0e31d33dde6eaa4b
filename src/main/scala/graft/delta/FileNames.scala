package graft.delta

import org.apache.hadoop.fs.Path

/** Log-file naming scheme (ref: util/FileNames.scala:30-61). */
object FileNames {
  private val deltaFileRegex = """\d+\.json""".r
  private val checkpointFileRegex = """\d+\.checkpoint(\.\d+\.\d+)?\.parquet""".r
  // V2 (uuid-named) checkpoints: one unique segment, json or parquet
  // (PROTOCOL.md "V2 Checkpoints") — the unique part cannot contain a
  // dot, so multi-part classic names (two numeric segments) never match
  private val v2CheckpointFileRegex =
    """\d+\.checkpoint\.[A-Za-z0-9_-]+\.(json|parquet)""".r

  def deltaFile(logPath: Path, version: Long): Path =
    new Path(logPath, f"$version%020d.json")

  def checkpointFileSingular(logPath: Path, version: Long): Path =
    new Path(logPath, f"$version%020d.checkpoint.parquet")

  /** Multi-part checkpoint file names: `V.checkpoint.i.n.parquet` for
    * i in 1..n (ref: util/FileNames.scala checkpointFileWithParts). */
  def checkpointFileWithParts(logPath: Path, version: Long, parts: Int): Seq[Path] =
    (1 to parts).map(i =>
      new Path(logPath, f"$version%020d.checkpoint.$i%010d.$parts%010d.parquet"))

  /** (part, totalParts) of a multi-part checkpoint file; None if singular. */
  def checkpointParts(path: Path): Option[(Int, Int)] = {
    val segments = path.getName.split('.')
    if (segments.length == 5) Some((segments(2).toInt, segments(3).toInt))
    else None
  }

  private val checksumFileRegex = """\d+\.crc""".r

  /** Per-version checksum `<version>.crc` (delta-spark convention). */
  def checksumFile(logPath: Path, version: Long): Path =
    new Path(logPath, f"$version%020d.crc")

  def isChecksumFile(path: Path): Boolean =
    checksumFileRegex.pattern.matcher(path.getName).matches()

  def checksumVersion(path: Path): Long =
    path.getName.stripSuffix(".crc").toLong

  def isDeltaFile(path: Path): Boolean =
    deltaFileRegex.pattern.matcher(path.getName).matches()

  // Log compaction files (delta PROTOCOL.md "Log Compaction Files"):
  // `{start}.{end}.compacted.json` holds the reconciled actions of
  // commits start..end. READ tolerance only — this engine never writes
  // them, but must read logs of writers that do.
  private val compactedFileRegex = """\d+\.\d+\.compacted\.json""".r

  def isCompactedFile(path: Path): Boolean =
    compactedFileRegex.pattern.matcher(path.getName).matches()

  def compactedFile(logPath: Path, start: Long, end: Long): Path =
    new Path(logPath, f"$start%020d.$end%020d.compacted.json")

  /** (start, end) of a compacted file's range. */
  def compactedRange(path: Path): (Long, Long) = {
    val parts = path.getName.split('.')
    (parts(0).toLong, parts(1).toLong)
  }

  /** Version RANGE a log entry covers: (v, v) for a plain commit, the
    * declared (start, end) for a compacted file. */
  def deltaVersionRange(path: Path): (Long, Long) =
    if (isCompactedFile(path)) compactedRange(path)
    else { val v = deltaVersion(path); (v, v) }

  def isCheckpointFile(path: Path): Boolean =
    checkpointFileRegex.pattern.matcher(path.getName).matches() ||
      isV2CheckpointFile(path)

  def isV2CheckpointFile(path: Path): Boolean =
    v2CheckpointFileRegex.pattern.matcher(path.getName).matches()

  /** V2 checkpoint name `V.checkpoint.<unique>.<ext>` (used by both the
    * fixture builders and [[Checkpoints.writeV2Checkpoint]]). */
  def v2CheckpointFile(logPath: Path, version: Long, unique: String,
                       ext: String = "json"): Path =
    new Path(logPath, f"$version%020d.checkpoint.$unique.$ext")

  def sidecarDir(logPath: Path): Path = new Path(logPath, "_sidecars")

  /** delta-spark's coordinated-commits staging area: a commit that is
    * claimed but not yet backfilled into the main log lives as
    * `_delta_log/_staged_commits/<%020d version>.<uuid>.json`, so foreign
    * readers of a mid-coordination table see the layout delta-spark
    * writes. Name filters everywhere else ignore the directory (it sorts
    * with the other `_`-prefixed non-commit entries). */
  def stagedCommitDir(logPath: Path): Path =
    new Path(logPath, "_staged_commits")

  def stagedCommitFile(logPath: Path, version: Long, unique: String): Path =
    new Path(stagedCommitDir(logPath), f"$version%020d.$unique.json")

  def deltaVersion(path: Path): Long =
    path.getName.stripSuffix(".json").toLong

  def checkpointVersion(path: Path): Long =
    path.getName.split('.').head.toLong

  def lastCheckpointFile(logPath: Path): Path =
    new Path(logPath, "_last_checkpoint")
}
