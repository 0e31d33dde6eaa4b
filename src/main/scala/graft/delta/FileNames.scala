package graft.delta

import org.apache.hadoop.fs.Path

/** Log-file naming scheme (ref: util/FileNames.scala:30-61). */
object FileNames {
  private val deltaFileRegex = """\d+\.json""".r
  private val checkpointFileRegex = """\d+\.checkpoint(\.\d+\.\d+)?\.parquet""".r

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

  def isDeltaFile(path: Path): Boolean =
    deltaFileRegex.pattern.matcher(path.getName).matches()

  def isCheckpointFile(path: Path): Boolean =
    checkpointFileRegex.pattern.matcher(path.getName).matches()

  def deltaVersion(path: Path): Long =
    path.getName.stripSuffix(".json").toLong

  def checkpointVersion(path: Path): Long =
    path.getName.split('.').head.toLong

  def lastCheckpointFile(logPath: Path): Path =
    new Path(logPath, "_last_checkpoint")
}
