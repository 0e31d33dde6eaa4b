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
