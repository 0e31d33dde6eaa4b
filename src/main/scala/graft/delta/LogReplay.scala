package graft.delta

import scala.collection.mutable

/** Snapshot state: the result of folding the action log.
  * Ref: SnapshotImpl.scala:375-383. */
case class State(
    protocol: Protocol,
    metadata: Metadata,
    setTransactions: Seq[SetTransaction],
    activeFiles: Seq[AddFile],
    tombstones: Seq[RemoveFile],
    sizeInBytes: Long,
    numOfFiles: Long,
    /** LIVE domain metadata (newest per domain, removed ones dropped —
      * absence IS the removal tombstone, since replay is ordered). */
    domains: Seq[DomainMetadata] = Nil)

object LogReplay {
  /** Fallback canonicalization (tables whose filesystem is unknown). */
  val uriNormalize: String => String =
    p => new java.net.URI(p).normalize().toString

  /** Reference path canonicalization (SnapshotImpl.scala:349-362 /
    * DeltaFileOperations): a bare absolute path qualifies against the
    * TABLE's filesystem, so `/x`, `file:/x` and `file:///x` — spellings
    * real writers mix (golden `canonicalized-paths-*`) — fold to ONE
    * key. The key is the normalized (scheme, authority, decoded path)
    * triple, never a URI string: `file:/x` vs `file:///x` differ only in
    * null-vs-empty authority, and the DECODED path is the true file name
    * (the log stores percent-encoded URIs; '+' is untouched by URI
    * decoding, so `a+b` and `a b` stay distinct). Internal identity
    * only — never written anywhere. Serializable, executor-safe. */
  def canonicalizer(fsUri: java.net.URI): String => String = { p =>
    val hp = new org.apache.hadoop.fs.Path(new java.net.URI(p))
    val q =
      if (hp.isAbsoluteAndSchemeAuthorityNull) {
        hp.makeQualified(fsUri, new org.apache.hadoop.fs.Path("/"))
      } else hp
    val u = q.toUri.normalize()
    val scheme = Option(u.getScheme).getOrElse("")
    val auth = Option(u.getAuthority).getOrElse("")
    scheme + "\u0000" + auth + "\u0000" + u.getPath
  }
}

/** In-memory log replay with reference semantics
  * (ref: actions/InMemoryLogReplay.scala:38-94):
  *
  *  - latest Protocol / Metadata / SetTransaction-per-appId wins;
  *  - an AddFile replaces any previous Add for the same (canonicalized
  *    path, deletion-vector id) key and cancels a previous tombstone;
  *  - a RemoveFile drops the key from active files and records a
  *    tombstone (kept until `minFileRetentionTimestamp` expiry, M15);
  *  - actions must be appended in ascending version order.
  *
  * The deletion-vector id participates in the key because a DV update
  * commits `remove(path, oldDv)` + `add(path, newDv)` in ONE version —
  * path-only keying would resolve that pair order-dependently (and drop
  * the file entirely when the remove happens to iterate last).
  *
  * This driver-side fold is O(live files) in memory and is used for logs
  * up to millions of files; [[DistributedLogReplay]] performs the same fold
  * as a Spark job for beyond-driver-memory logs (SURVEY.md §2.1 M3).
  */
/** @param retainAdds when false, AddFiles are folded for their SIDE
  *   EFFECT only (cancelling an earlier tombstone for the same key) and
  *   never retained — the P&M/tombstone "light" fold of a distributed
  *   snapshot needs no active-file list, and retaining even stripped
  *   add keys is O(files) driver memory (a CONVERT/backfill commit can
  *   carry 500k+ adds; see FileCountScaleSpec). The resulting state's
  *   activeFiles/numOfFiles/sizeInBytes are empty/0 by construction —
  *   light-state consumers never read them. */
class InMemoryLogReplay(
    minFileRetentionTimestamp: Long,
    canonical: String => String = LogReplay.uriNormalize,
    retainAdds: Boolean = true) {
  private var currentProtocol: Protocol = _
  private var currentMetadata: Metadata = _
  private var currentVersion: Long = -1
  private val transactions = mutable.HashMap.empty[String, SetTransaction]
  private val activeFiles = mutable.LinkedHashMap.empty[String, AddFile]
  private val tombstones = mutable.HashMap.empty[String, RemoveFile]
  private val domains = mutable.HashMap.empty[String, DomainMetadata]

  /** Initialize the fold from an ALREADY-FOLDED state at `version` — the
    * incremental-update path: a superseded snapshot's state seeds its
    * successor, which then appends only the commits after `version`
    * instead of re-reading the checkpoint and re-parsing every commit.
    * Seeded entries rebuild the same (canonical path, dvId) keys the
    * original fold used, so subsequent appends resolve identically. */
  def seed(version: Long, state: State): Unit = {
    require(currentVersion == -1, "seed() must precede every append()")
    currentVersion = version
    currentProtocol = state.protocol
    currentMetadata = state.metadata
    state.setTransactions.foreach(t => transactions(t.appId) = t)
    state.activeFiles.foreach(a =>
      activeFiles(canonical(a.path) + "\u0000" + a.dvId) = a)
    state.tombstones.foreach(r =>
      tombstones(canonical(r.path) + "\u0000" + r.dvId) = r)
    state.domains.foreach(d => domains(d.domain) = d)
  }

  def append(version: Long, actions: Iterator[Action]): Unit = {
    // strictly increasing, not necessarily +1: a compacted range file
    // folds at its END version, jumping over the commits it reconciles
    // (coverage contiguity is enforced at segment-assembly time)
    require(version > currentVersion,
      s"Attempted to replay version $version after $currentVersion")
    currentVersion = version
    actions.foreach {
      case p: Protocol => currentProtocol = p
      case m: Metadata => currentMetadata = m
      case t: SetTransaction => transactions(t.appId) = t
      case a: AddFile =>
        val key = canonical(a.path) + "\u0000" + a.dvId
        if (retainAdds) activeFiles(key) = a.copy(dataChange = false)
        tombstones.remove(key)
      case r: RemoveFile =>
        val key = canonical(r.path) + "\u0000" + r.dvId
        activeFiles.remove(key)
        tombstones(key) = r.copy(dataChange = false)
      case d: DomainMetadata => domains(d.domain) = d
      case _: AddCDCFile => // never part of table state
      case _: CommitInfo => // provenance only
      case null => // ignorable / unknown action
    }
  }

  def checkpointVersion: Long = currentVersion

  def state: State = {
    require(currentMetadata != null,
      s"No Metadata found in log up to version $currentVersion — table corrupt")
    val adds = activeFiles.values.toVector
    State(
      protocol = Option(currentProtocol).getOrElse(Protocol()),
      metadata = currentMetadata,
      setTransactions = transactions.values.toVector,
      activeFiles = adds,
      // M15 tombstone expiry: drop removes older than the retention window
      tombstones = tombstones.values
        .filter(_.delTimestamp > minFileRetentionTimestamp).toVector,
      sizeInBytes = adds.map(_.size).sum,
      numOfFiles = adds.size.toLong,
      domains = domains.values.filterNot(_.removed).toVector)
  }
}
