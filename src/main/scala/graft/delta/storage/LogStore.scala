package graft.delta.storage

import java.io.FileNotFoundException
import java.nio.charset.StandardCharsets.UTF_8

import scala.io.{Codec, Source}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileStatus, FileSystem, Path}

/** Storage abstraction for the transaction log.
  *
  * The atomicity boundary of the whole engine: `write(path, overwrite=false)`
  * must be all-or-nothing and fail with [[FileAlreadyExistsException]] if the
  * destination exists — that mutual exclusion is what makes commits ACID.
  * Semantics follow the reference's LogStore contract
  * (`/root/reference/standalone/src/main/scala/io/delta/standalone/internal/storage/HadoopFileSystemLogStore.scala:34-120`).
  */
trait LogStore {
  /** Read the file as UTF-8 lines. */
  def read(path: Path, conf: Configuration): Seq[String]

  /** Write all lines atomically; if `overwrite` is false and the target
    * exists, throw FileAlreadyExistsException without modifying it. */
  def write(path: Path, lines: Iterator[String], overwrite: Boolean,
            conf: Configuration): Unit

  /** List files in the parent of `path` whose name is >= path's name,
    * sorted by path. */
  def listFrom(path: Path, conf: Configuration): Iterator[FileStatus]

  def isPartialWriteVisible(path: Path, conf: Configuration): Boolean = true
}

/** Rename-based store for file systems with atomic rename (local, HDFS).
  *
  * Write protocol (ref HadoopFileSystemLogStore.writeWithRename:63-120):
  * write to a temp file in the same directory, hflush/close, then
  * `rename(temp, dest)` with no-overwrite semantics. A rename that returns
  * false with the destination now present is a concurrent-writer loss →
  * FileAlreadyExistsException (the commit loop retries at the next version).
  */
class HadoopFileSystemLogStore extends LogStore {

  override def read(path: Path, conf: Configuration): Seq[String] = {
    val fs = path.getFileSystem(conf)
    val stream = fs.open(path)
    try {
      Source.fromInputStream(stream)(Codec.UTF8).getLines().toVector
    } finally stream.close()
  }

  override def write(path: Path, lines: Iterator[String], overwrite: Boolean,
                     conf: Configuration): Unit = {
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path.getParent)) fs.mkdirs(path.getParent)
    if (overwrite) {
      val out = fs.create(path, true)
      try lines.foreach(l => out.write((l + "\n").getBytes(UTF_8)))
      finally out.close()
      return
    }
    if (fs.exists(path)) throw new FileAlreadyExistsException(path.toString)
    val temp = new Path(path.getParent,
      s".${path.getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(temp)
    var renamed = false
    try {
      lines.foreach(l => out.write((l + "\n").getBytes(UTF_8)))
      out.close()
      if (fs.rename(temp, path)) {
        renamed = true
      } else {
        if (fs.exists(path)) throw new FileAlreadyExistsException(path.toString)
        else throw new java.io.IOException(s"rename $temp -> $path failed")
      }
    } finally {
      if (!renamed) fs.delete(temp, false)
    }
  }

  override def listFrom(path: Path, conf: Configuration): Iterator[FileStatus] = {
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path.getParent)) {
      throw new FileNotFoundException(s"No such directory: ${path.getParent}")
    }
    fs.listStatus(path.getParent)
      .filter(_.getPath.getName >= path.getName)
      .sortBy(_.getPath.getName)
      .iterator
  }
}

object LogStore {
  /** Scheme-based selection (ref DelegatingLogStore.scala:33-135). Local
    * and HDFS share the rename-based store; object-store variants would
    * plug in here. */
  def forPath(path: Path): LogStore = new HadoopFileSystemLogStore
}
