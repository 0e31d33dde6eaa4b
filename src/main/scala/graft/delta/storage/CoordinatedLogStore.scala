package graft.delta.storage

import java.nio.charset.StandardCharsets.UTF_8

import scala.io.{Codec, Source}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileStatus, Path}

/** External commit coordination for MULTI-WRITER object stores.
  *
  * [[ObjectStoreLogStore]] emulates put-if-absent inside one JVM (the
  * reference's S3SingleDriverLogStore constraint,
  * `/root/reference/standalone/src/main/scala/io/delta/standalone/internal/storage/`);
  * two independent clusters writing one S3 table can still both "win" a
  * version. The production answer (the DynamoDB commit-log pattern) is an
  * external coordinator whose conditional put decides every
  * `(table, version)` race globally. This store is that seam: the
  * coordinator interface is tiny and user-pluggable, the write protocol
  * is crash-safe, and correctness never depends on the object store
  * providing atomic rename or read-after-write listings.
  *
  * Write protocol for no-overwrite targets (commit files):
  *  1. write the payload to a uniquely-named temp object in the log dir
  *     (all-or-nothing on close; never contended);
  *  2. `prepareCommit(dir, name, temp)` — the coordinator's atomic
  *     claim; losing it is the FileAlreadyExistsException that drives
  *     the transaction retry loop;
  *  3. copy temp → final name (uncontended: the claim made this writer
  *     the only one publishing that name) and mark the claim complete.
  *
  * A writer crashing between 2 and 3 leaves a claimed-but-unpublished
  * commit; ANY subsequent reader or writer heals it first
  * ([[recover]] copies the temp object to its final name) — the same
  * recovery contract as the DynamoDB log store's incomplete entries. So
  * the commit is durable the moment the claim succeeds.
  */
class CoordinatedLogStore(coordinator: CommitCoordinator) extends LogStore {

  /** Hadoop-conf-driven construction ([[LogStore.forPath]] overrides)
    * uses the process-wide coordinator registry. */
  def this() = this(CommitCoordinator.global)

  private def fsOf(path: Path, conf: Configuration) = path.getFileSystem(conf)

  /** Publish every claimed-but-unpublished commit in `dir`. */
  private def recover(dir: Path, conf: Configuration): Unit = {
    val fs = fsOf(dir, conf)
    coordinator.pending(dir.toUri.toString).foreach { case (name, temp) =>
      val dest = new Path(dir, name)
      val tempPath = new Path(temp)
      try {
        if (!fs.exists(dest) && fs.exists(tempPath)) {
          val in = fs.open(tempPath)
          val bytes = try {
            val bos = new java.io.ByteArrayOutputStream()
            org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 4096, false)
            bos.toByteArray
          } finally in.close()
          val out = fs.create(dest, true)
          try out.write(bytes) finally out.close()
        }
        coordinator.commitComplete(dir.toUri.toString, name)
      } catch {
        // the OWNER may publish and delete its temp while we heal; the
        // entry is then completed (or will be) by the owner — healing is
        // best-effort by design, never a reader failure
        case scala.util.control.NonFatal(_) =>
      }
    }
  }

  override def read(path: Path, conf: Configuration): Seq[String] = {
    recover(path.getParent, conf)
    val stream = fsOf(path, conf).open(path)
    try Source.fromInputStream(stream)(Codec.UTF8).getLines().toVector
    finally stream.close()
  }

  override def write(path: Path, lines: Iterator[String], overwrite: Boolean,
                     conf: Configuration): Unit = {
    val fs = fsOf(path, conf)
    val dir = path.getParent
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val payload = {
      val sb = new StringBuilder
      lines.foreach(l => sb.append(l).append('\n'))
      sb.toString.getBytes(UTF_8)
    }
    if (overwrite) { // only _last_checkpoint: no exclusivity needed
      val out = fs.create(path, true)
      try out.write(payload) finally out.close()
      return
    }
    recover(dir, conf)
    if (fs.exists(path)) throw new FileAlreadyExistsException(path.toString)
    val temp = new Path(dir,
      s".${path.getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(temp, false)
    try out.write(payload) finally out.close()
    if (!coordinator.prepareCommit(dir.toUri.toString, path.getName,
        temp.toUri.toString)) {
      fs.delete(temp, false)
      throw new FileAlreadyExistsException(path.toString)
    }
    // the claim is ours alone: publishing cannot be contended, and a
    // crash from here on is healed by the next recover()
    val pub = fs.create(path, true)
    try pub.write(payload) finally pub.close()
    coordinator.commitComplete(dir.toUri.toString, path.getName)
    fs.delete(temp, false)
  }

  override def listFrom(path: Path, conf: Configuration): Iterator[FileStatus] = {
    recover(path.getParent, conf)
    val fs = fsOf(path, conf)
    if (!fs.exists(path.getParent)) {
      throw new java.io.FileNotFoundException(
        s"No such directory: ${path.getParent}")
    }
    fs.listStatus(path.getParent)
      .filter(_.getPath.getName >= path.getName)
      .sortBy(_.getPath.getName)
      .iterator
  }

  override def isPartialWriteVisible(path: Path, conf: Configuration): Boolean =
    false
}

/** The pluggable mutual-exclusion service: one atomic conditional put per
  * `(log dir, file name)` across every participating writer — cluster
  * boundaries included. Implementations back this with DynamoDB-style
  * conditional writes, a database unique key, ZooKeeper, etc. All methods
  * must be atomic and linearizable per (dir, name). */
trait CommitCoordinator {
  /** Claim `(dir, name)`, recording `tempPath` as the payload staged for
    * it. Returns true for exactly ONE caller per (dir, name), globally. */
  def prepareCommit(dir: String, name: String, tempPath: String): Boolean

  /** Mark a claimed name as published (its final object exists). */
  def commitComplete(dir: String, name: String): Unit

  /** Claimed-but-unpublished entries for `dir`: (name, tempPath). */
  def pending(dir: String): Seq[(String, String)]
}

/** In-memory coordinator: the contract reference used by tests and the
  * default for conf-driven construction — correct for writers sharing a
  * JVM and a faithful stand-in for a conditional-put service. */
class InMemoryCommitCoordinator extends CommitCoordinator {
  private case class Entry(tempPath: String,
                           @volatile var complete: Boolean = false)
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Entry]

  override def prepareCommit(dir: String, name: String,
                             tempPath: String): Boolean =
    entries.putIfAbsent((dir, name), Entry(tempPath)) == null

  override def commitComplete(dir: String, name: String): Unit =
    Option(entries.get((dir, name))).foreach(_.complete = true)

  override def pending(dir: String): Seq[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    entries.forEach { (k, e) =>
      if (k._1 == dir && !e.complete) out += ((k._2, e.tempPath))
    }
    out.result()
  }
}

object CommitCoordinator {
  /** Process-wide coordinator used when [[CoordinatedLogStore]] is
    * selected through the Hadoop conf (no-arg construction); replaceable
    * for tests or embedding. */
  @volatile var global: CommitCoordinator = new InMemoryCommitCoordinator
}
