package graft.delta.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadAllAvailable, ReadLimit, ReadMaxBytes, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.StructType

import graft.delta._
import graft.delta.read.DeltaFileIndex

/** Streaming offset: `(version, index)`, plus a `snapshot` tier. A
  * version-boundary offset (`index == END`) means every data AddFile of
  * `version` is consumed; a sub-version offset means the first `index`
  * data-change AddFiles of `version` (in commit-file line order, which
  * is stable) are consumed and the rest are pending. The sub-version
  * form only appears while admission control chunks a commit LARGER
  * than the per-trigger budget — the delta-spark IndexedFile scheme
  * re-expressed on this source's version offsets, so a 500k-add
  * CONVERT/backfill commit streams as many bounded batches instead of
  * one giant one.
  *
  * SNAPSHOT offsets (`isSnapshot`) chunk the INITIAL snapshot of a
  * no-startingVersion stream: `{"version":v,"index":i,"snapshot":true}`
  * means the first `i` files of the snapshot AT version `v` — in stable
  * sort-by-path order — are consumed. The drain ends at the plain
  * boundary offset of `v`, after which the commit walk proceeds from
  * `v+1` as usual; snapshot offsets therefore sort BELOW every
  * same-version commit-walk offset (ref: the Flink enumerator's
  * {snapshot, processedPaths} split, SnapshotProcessor.java:53-62 +
  * DeltaFileEnumerator.java:53-80 — re-keyed from a path set to a rank
  * in a deterministic total order so the offset stays O(1)).
  *
  * Boundary offsets serialize as the bare version number, so offset logs
  * written before sub-version chunking existed parse unchanged (and new
  * logs stay readable by older readers unless a giant commit or initial
  * snapshot is mid-chunk at the moment of downgrade). */
private[delta] case class DeltaSourceOffset(version: Long, index: Long,
    isSnapshot: Boolean = false)
    extends Offset {
  import DeltaSourceOffset.END
  override def json: String =
    if (isSnapshot) s"""{"version":$version,"index":$index,"snapshot":true}"""
    else if (index == END) version.toString
    else s"""{"version":$version,"index":$index}"""
  def isVersionBoundary: Boolean = !isSnapshot && index == END
  private def tier: Int = if (isSnapshot) 0 else 1
  def <=(o: DeltaSourceOffset): Boolean =
    version < o.version || (version == o.version &&
      (tier < o.tier || (tier == o.tier && index <= o.index)))
}

private[delta] object DeltaSourceOffset {
  /** Sentinel for "whole version consumed" — compares above any real
    * file index. */
  val END: Long = Long.MaxValue
  private val Pat =
    """\s*\{\s*"version"\s*:\s*(\d+)\s*,\s*"index"\s*:\s*(\d+)\s*\}\s*""".r
  private val PatSnapshot =
    ("""\s*\{\s*"version"\s*:\s*(\d+)\s*,\s*"index"\s*:\s*(\d+)\s*,\s*""" +
      """"snapshot"\s*:\s*true\s*\}\s*""").r
  def parse(json: String): DeltaSourceOffset = json match {
    case PatSnapshot(v, i) =>
      DeltaSourceOffset(v.toLong, i.toLong, isSnapshot = true)
    case Pat(v, i) => DeltaSourceOffset(v.toLong, i.toLong)
    case s => DeltaSourceOffset(s.trim.toLong, END) // bare-version (legacy)
  }
  def boundary(version: Long): DeltaSourceOffset =
    DeltaSourceOffset(version, END)
}

/** One file of a pinned initial snapshot with its rank in the stable
  * sort-by-path order and the cumulative byte size up to and including
  * it — the distributed index the snapshot-drain cursor slices. */
private[delta] case class SnapshotIndexedFile(idx: Long, cumBytes: Long,
                                              add: AddFile)

/** Structured-Streaming micro-batch source over a Delta table
  * (SURVEY §2.4 F1–F6: the Flink continuous source re-expressed on
  * Spark's micro-batch executor).
  *
  * The offset is the table version plus an intra-version file index
  * ([[DeltaSourceOffset]]) — Spark's offset log replaces the
  * Flink enumerator's {version, processedPaths} checkpoints (F5), and
  * task scheduling replaces split assignment. A batch for offset range
  * (o1, o2] is the union of sanitized AddFiles committed in that range,
  * planned through the same [[DeltaFileIndex]] as batch reads
  * (vectorized parquet, pushdown, pruning all apply).
  *
  * Scale shape: every walk over the commit range STREAMS each commit
  * file ([[DeltaLog.streamCommitActions]]) — admission counting retains
  * nothing and batch planning retains only the admitted chunk, so the
  * per-trigger driver footprint is O(budget), never O(commit). The
  * chunked versions are re-scanned once per trigger (the same
  * read-the-json-per-trigger shape delta-spark's getFileChanges has);
  * the scan is a driver-side line stream, no Spark job.
  *
  * Options (F4, names match the reference's DeltaSourceOptions):
  *  - `startingVersion`: "latest" or a version number. Absent → initial
  *    snapshot first (F1-style), then changes.
  *  - `ignoreDeletes`: tolerate delete-only commits (skipped).
  *  - `ignoreChanges`: tolerate rewrite commits (their AddFiles are
  *    re-emitted; downstream must de-duplicate).
  * Mid-stream Metadata/Protocol changes fail the stream (F3,
  * ActionProcessor.java:56-108).
  */
class DeltaSource(
    sqlContext: SQLContext,
    deltaLog: DeltaLog,
    options: Map[String, String]) extends Source
  with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val spark: SparkSession = sqlContext.sparkSession
  private val ignoreDeletes =
    options.getOrElse("ignoreDeletes", "false").toBoolean
  private val ignoreChanges =
    options.getOrElse("ignoreChanges", "false").toBoolean
  /** Default TRUE (delta-spark's streaming semantics): a commit between
    * the stream's offset and the head that no longer exists (log cleanup,
    * or subsumed by a log compaction file) fails the stream rather than
    * silently skipping its rows. Opting out accepts the gap. */
  private val failOnDataLoss =
    options.getOrElse("failOnDataLoss", "true").toBoolean

  /** Skip rewrite/delete commits entirely (their rows are neither
    * re-emitted nor failed on) — the modern replacement for
    * ignoreChanges/ignoreDeletes, which either re-emit rewritten rows
    * (duplicates downstream) or only tolerate delete-only commits. */
  private val skipChangeCommits =
    options.getOrElse("skipChangeCommits", "false").toBoolean
  /** Stream the change data feed instead of table rows: each batch emits
    * schema + _change_type + _commit_version, serving recorded CDC files
    * for rewrite commits and deriving inserts/deletes for plain ones. */
  private val readChangeFeed =
    options.getOrElse("readChangeFeed", "false").toBoolean

  // version at which this stream started; metadata changes at or before
  // this version are part of the initial snapshot, not "mid-stream"
  private val initialSnapshot: Snapshot = deltaLog.update()
  private val startingVersion: Option[Long] = {
    require(!(options.contains("startingVersion") &&
        options.contains("startingTimestamp")),
      "startingVersion and startingTimestamp are mutually exclusive " +
        "(ref DeltaSourceOptions validation)")
    options.get("startingVersion").map {
      case "latest" => initialSnapshot.version + 1
      case v => v.toLong
    }.orElse(options.get("startingTimestamp").map { ts =>
      // first version whose commit timestamp is at or after ts (F4)
      deltaLog.getVersionAtOrAfterTimestamp(
        graft.delta.TimestampParsing.parseMillis(spark, ts))
    })
  }

  override val schema: StructType =
    if (!readChangeFeed) initialSnapshot.metadata.schema
    // ONE definition of the CDF shape (CdfRelation.cdfSchema) — batch
    // reads, this source, and sourceSchema must never drift apart
    else graft.delta.read.CdfRelation.cdfSchema(initialSnapshot.metadata)

  /** Rate limit: cap each micro-batch at this many data AddFiles (a
    * batch always makes progress — at least one file). With
    * [[SupportsAdmissionControl]] the engine hands the committed start
    * offset to [[latestOffset]], so the cap holds across restarts too
    * (the reference's bounded/continuous split, DeltaSource.java:121-150,
    * maps onto ReadLimit-driven admission). A commit larger than the cap
    * is CHUNKED by sub-version offsets (non-CDF streams) — the budget
    * bounds the batch, not just the version count. The INITIAL SNAPSHOT
    * (no startingVersion) chunks too, via snapshot offsets over the
    * sort-by-path cursor — a 100 TB table's first batch is as bounded as
    * every later one.
    *
    * Every CDF version shape chunks: pure-add by add index, cdc-carrying
    * by cdc-file index, delete-only by remove index. The only
    * version-granular admission left is an add+remove commit WITHOUT
    * change files, which the CDF read refuses downstream anyway. */
  private val maxFilesPerTrigger: Option[Int] =
    options.get("maxFilesPerTrigger").map(_.toInt)

  /** Byte-based rate limit (`maxBytesPerTrigger`, e.g. "64m"): cap each
    * micro-batch at versions whose data AddFiles total at most this many
    * bytes (again always admitting at least one version). File- and
    * byte-caps compose — the batch ends at whichever budget runs out
    * first, the reference's soft-limit semantics. */
  private val maxBytesPerTrigger: Option[Long] =
    options.get("maxBytesPerTrigger").map(parseBytes)

  private def parseBytes(s: String): Long = {
    val t0 = s.trim.toLowerCase(java.util.Locale.ROOT)
    // accept both "64m" and "64mb" spellings
    val t = if (t0.length > 1 && t0.endsWith("b") &&
        "kmg".contains(t0.charAt(t0.length - 2))) t0.dropRight(1) else t0
    val (num, mult) = t.last match {
      case 'k' => (t.dropRight(1), 1L << 10)
      case 'm' => (t.dropRight(1), 1L << 20)
      case 'g' => (t.dropRight(1), 1L << 30)
      case 'b' => (t.dropRight(1), 1L)
      case _ => (t, 1L)
    }
    val v = num.trim.toLong * mult
    require(v > 0, s"maxBytesPerTrigger must be positive: $s")
    v
  }
  private var lastReported: Option[DeltaSourceOffset] = None

  /** Trigger.AvailableNow: pin the head version at stream start; batches
    * (still rate-limited) drain up to it, then the query stops. */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowTarget = Some(deltaLog.update().version)
  }

  override def getDefaultReadLimit: ReadLimit = {
    val limits: Seq[ReadLimit] =
      maxFilesPerTrigger.map(ReadLimit.maxFiles(_)).toSeq ++
        maxBytesPerTrigger.map(ReadLimit.maxBytes(_)).toSeq
    limits match {
      // delta-spark's default (DeltaOptions.MAX_FILE_PER_TRIGGER default
      // 1000): an un-optioned stream must not admit an unbounded batch —
      // at 100 TB "all available" after downtime is the whole backlog
      case Nil => ReadLimit.maxFiles(DeltaSource.DefaultMaxFilesPerTrigger)
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  /** The engine-facing offset resolution (V2 admission control over the
    * V1 Source, the FileStreamSource pattern). */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val head0 = deltaLog.update().version
    val head = availableNowTarget.fold(head0)(math.min(head0, _))
    if (head < 0) return null
    val base: Option[DeltaSourceOffset] = Option(startOffset).map(offsetOf)
      .orElse(lastReported)
      .orElse(startingVersion.map(sv => DeltaSourceOffset.boundary(sv - 1)))
    val (fileBudget, byteBudget) = budgets(limit)
    val end = base match {
      case None =>
        // F1 initial snapshot (no startingVersion): pin the snapshot at
        // the current head and drain it in budget-bounded chunks
        snapshotDrainEnd(head, 0L, fileBudget, byteBudget)
      case Some(b) if b.isSnapshot =>
        // mid-drain: keep serving the PINNED snapshot version (chunks of
        // two different snapshots would not compose to any table state);
        // commits past it are walked once the drain completes
        snapshotDrainEnd(b.version, b.index, fileBudget, byteBudget)
      case Some(b) if (b.version < head || !b.isVersionBoundary) &&
          (fileBudget.isDefined || byteBudget.isDefined) =>
        cappedEnd(b, head, fileBudget, byteBudget)
      case _ => DeltaSourceOffset.boundary(head)
    }
    startingVersion match {
      case Some(sv) if end.version < sv => null // nothing at/after start yet
      case _ =>
        lastReported = Some(end)
        end
    }
  }

  override def reportLatestOffset(): OffsetV2 = {
    val head = deltaLog.update().version
    if (head < 0) null else LongOffset(head)
  }

  /** (file budget, byte budget) extracted from the engine's ReadLimit. */
  private def budgets(limit: ReadLimit): (Option[Int], Option[Long]) =
    limit match {
      case m: ReadMaxFiles => (Some(m.maxFiles()), maxBytesPerTrigger)
      case b: ReadMaxBytes => (maxFilesPerTrigger, Some(b.maxBytes()))
      case c: CompositeReadLimit =>
        (c.getReadLimits.collectFirst { case m: ReadMaxFiles => m.maxFiles() },
          c.getReadLimits.collectFirst { case b: ReadMaxBytes => b.maxBytes() })
      case _: ReadAllAvailable => (None, None)
      case _ => (maxFilesPerTrigger, maxBytesPerTrigger)
    }

  // ------------------------------------------------------ chunked-walk memo
  /** Byte-offset memo for the version currently being chunked: the byte
    * offset of every data-add LINE in its commit file, the version's
    * total add count, whether it carries dataChange removes, and whether
    * its sanitation checks already ran. One full byte-counting scan
    * builds it; every later walk over the same version SEEKS straight to
    * its slice — without this, each of a giant commit's chunks re-reads
    * the whole file in both latestOffset and getBatch, and draining a
    * 500k-add commit at a 10k budget costs ~100 full scans (measured
    * 120 s; with the memo the whole drain is ~3 scans' worth of IO).
    * Memory: one Long per add (8 MB at 1M adds) for exactly ONE version
    * at a time, replaced when the walk moves on. */
  private case class WalkMemo(version: Long, addOffsets: Array[Long],
                              addBytes: Long, cdcOffsets: Array[Long],
                              cdcBytes: Long, removeOffsets: Array[Long],
                              removeBytes: Long, sanitized: Boolean) {
    def totalAdds: Long = addOffsets.length.toLong
    def totalCdc: Long = cdcOffsets.length.toLong
    def totalRemoves: Long = removeOffsets.length.toLong
    def sawCdc: Boolean = cdcOffsets.nonEmpty
    def sawRemoves: Boolean = removeOffsets.nonEmpty
    /** PURE-add versions (no change files, no dataChange removes — the
      * CONVERT/backfill shape) are the ones whose change rows are a
      * per-add derivation, so a slice of them is well-defined. */
    def pureAdds: Boolean = !sawRemoves && !sawCdc
    /** DELETE-only versions (removes, no adds, no change files — the
      * partition-delete/retention shape): each remove independently
      * derives that file's delete rows, so a slice is well-defined. */
    def deleteOnly: Boolean =
      sawRemoves && !sawCdc && addOffsets.isEmpty
  }
  private var walkMemo: Option[WalkMemo] = None

  /** Full byte-counting scan of version `v`: builds the memo, optionally
    * runs the version's sanitation checks (Metadata/Protocol — the
    * checks throw), and feeds every data-add to `onAdd` with its index.
    * Byte positions assume '\n' separators (what every supported store
    * writes); a foreign file with different separators just fails the
    * seek validation later and falls back here. */
  private def fullScan(path: org.apache.hadoop.fs.Path, v: Long,
                       sanitize: Boolean)(
      onAdd: (Long, AddFile) => Unit,
      onCdc: (Long, AddCDCFile) => Unit = (_, _) => (),
      onRemove: (Long, RemoveFile) => Unit = (_, _) => ()): WalkMemo = {
    val in = deltaLog.openCommitStream(path)
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Long]
    val cdcOffsets = scala.collection.mutable.ArrayBuffer.empty[Long]
    val removeOffsets = scala.collection.mutable.ArrayBuffer.empty[Long]
    var addBytes = 0L
    var cdcBytes = 0L
    var removeBytes = 0L
    var pos = 0L
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines().foreach { l =>
        val start = pos
        pos += l.getBytes(java.nio.charset.StandardCharsets.UTF_8).length + 1L
        val t = l.trim
        if (t.nonEmpty) {
          JsonCodec.actionFromJson(t) match {
            case a: AddFile if a.dataChange =>
              onAdd(offsets.length.toLong, a)
              offsets += start
              addBytes += a.size
            case r: RemoveFile if r.dataChange =>
              onRemove(removeOffsets.length.toLong, r)
              removeOffsets += start
              removeBytes += r.size.getOrElse(0L)
            case c: AddCDCFile =>
              onCdc(cdcOffsets.length.toLong, c)
              cdcOffsets += start
              cdcBytes += c.size
            case m: Metadata if sanitize && v > initialSnapshot.version &&
                (m.schemaString != initialSnapshot.metadata.schemaString ||
                  m.partitionColumns !=
                    initialSnapshot.metadata.partitionColumns) =>
              throw new UnsupportedOperationException(
                s"Detected a schema/metadata change at version $v; restart " +
                  "the stream to pick it up")
            case p: Protocol if sanitize &&
                (!readChangeFeed || v > initialSnapshot.version) =>
              // CDF back-reads tolerate pre-start protocol HISTORY (a
              // since-removed feature's old Protocol line must not kill
              // a history read); the non-CDF path checks every version
              require(p.minReaderVersion <= 2 ||
                (p.minReaderVersion == 3 &&
                  graft.delta.TableFeatures.unsupportedReader(p).isEmpty),
                s"Unsupported protocol change at version $v: $p")
            case _ =>
          }
        }
      }
    } finally in.close()
    val memo = WalkMemo(v, offsets.toArray, addBytes, cdcOffsets.toArray,
      cdcBytes, removeOffsets.toArray, removeBytes,
      sanitized = sanitize ||
        walkMemo.exists(m => m.version == v && m.sanitized))
    walkMemo = Some(memo)
    memo
  }

  /** Walk the selected action kind of a memo'd version from index
    * `fromIdx`, seeking straight to that action's recorded byte offset.
    * `onItem` returns false to stop early (budget exhausted / slice
    * complete). Returns false — caller falls back to a full scan — when
    * the seek lands on anything the selector rejects (stale or
    * byte-shifted memo). */
  private def seekWalkActions[T](path: org.apache.hadoop.fs.Path,
                                 offsets: Array[Long], fromIdx: Long)(
      select: Action => Option[T])(onItem: (Long, T) => Boolean): Boolean = {
    if (fromIdx >= offsets.length) return true
    val in = deltaLog.openCommitStream(path)
    try {
      in.seek(offsets(fromIdx.toInt))
      val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      var idx = fromIdx
      var first = true
      var keep = true
      while (keep && lines.hasNext) {
        val t = lines.next().trim
        val action =
          if (t.isEmpty) null
          else if (first) {
            // validation: the memo promised a selected action exactly here
            try JsonCodec.actionFromJson(t)
            catch { case scala.util.control.NonFatal(_) => null }
          } else JsonCodec.actionFromJson(t)
        Option(action).flatMap(select) match {
          case Some(item) =>
            first = false
            keep = onItem(idx, item)
            idx += 1
          case None =>
            if (first) return false
        }
      }
      true
    } finally in.close()
  }

  /** Data-add walk (backfill chunking). */
  private def seekWalk(path: org.apache.hadoop.fs.Path, memo: WalkMemo,
                       fromIdx: Long)(
      onAdd: (Long, AddFile) => Boolean): Boolean =
    seekWalkActions(path, memo.addOffsets, fromIdx) {
      case a: AddFile if a.dataChange => Some(a)
      case _ => None
    }(onAdd)

  /** Change-file walk (cdc-version CDF chunking). */
  private def seekWalkCdc(path: org.apache.hadoop.fs.Path, memo: WalkMemo,
                          fromIdx: Long)(
      onCdc: (Long, AddCDCFile) => Boolean): Boolean =
    seekWalkActions(path, memo.cdcOffsets, fromIdx) {
      case c: AddCDCFile => Some(c)
      case _ => None
    }(onCdc)

  /** Data-remove walk (delete-only-version CDF chunking). */
  private def seekWalkRemoves(path: org.apache.hadoop.fs.Path,
                              memo: WalkMemo, fromIdx: Long)(
      onRemove: (Long, RemoveFile) => Boolean): Boolean =
    seekWalkActions(path, memo.removeOffsets, fromIdx) {
      case r: RemoveFile if r.dataChange => Some(r)
      case _ => None
    }(onRemove)

  // ------------------------------------------------- initial-snapshot cursor
  /** The pinned initial snapshot's distributed index: every active file
    * ranked by the stable sort-by-path order, with cumulative bytes. The
    * Dataset is PERSISTED on the executors for the duration of the drain
    * (one sort of the state, reused by every chunk) and never collected
    * whole — latestOffset cuts with small count jobs and getBatch
    * collects only the admitted O(budget) slice. Rebuilt identically
    * after a restart because paths are unique within a snapshot, so the
    * rank is a deterministic function of the snapshot alone (the role of
    * the reference enumerator's processedPaths set,
    * DeltaFileEnumerator.java:53-80, at O(1) offset size). */
  private case class SnapshotCursor(version: Long, total: Long,
      indexed: org.apache.spark.sql.Dataset[SnapshotIndexedFile])
  private var snapshotCursor: Option[SnapshotCursor] = None
  /** Precomputed chunk-boundary chain for a BYTE-budgeted drain
    * (VERDICT r14 #4): (fileBudget, byteBudget, ascending cut indices
    * [0, c1, ..., total]). Computed ONCE per cursor by a single
    * streaming pass; every later trigger whose `from` sits on the chain
    * cuts with ZERO jobs (file-only budgets were already arithmetic). */
  private var cursorCuts: Option[(Option[Int], Option[Long], Array[Long])] =
    None
  /** Budgets changing MID-drain would recompute the chain per trigger —
    * worse than the count job it replaces; after one recompute the
    * chain disables itself for the cursor's lifetime. */
  private var cutsRebuilt = false

  /** `persist = false` builds a TRANSIENT cursor — used when a restart's
    * replayed batch IS the final slice (VERDICT r14 #4): caching a sort
    * of the entire table state to serve one batch and immediately
    * release it wastes executor memory for nothing. The transient cursor
    * is not retained, so a subsequent (impossible in that path) trigger
    * would just rebuild. */
  private def cursorFor(v: Long,
                        persist: Boolean = true): SnapshotCursor =
    snapshotCursor match {
    case Some(c) if c.version == v => c
    case stale =>
      stale.foreach(_.indexed.unpersist())
      snapshotCursor = None
      cursorCuts = None
      cutsRebuilt = false
      val snap = deltaLog.getSnapshotForVersionAsOf(v)
      // the drain serves state at v through the schema pinned at stream
      // construction — a schema/partitioning change in between would
      // otherwise be served silently with the stale schema forever
      if (snap.metadata.schemaString !=
            initialSnapshot.metadata.schemaString ||
          snap.metadata.partitionColumns !=
            initialSnapshot.metadata.partitionColumns) {
        throw new UnsupportedOperationException(
          s"Table schema changed between stream start " +
            s"(${initialSnapshot.version}) and the initial snapshot " +
            s"batch ($v); restart the stream to pick it up")
      }
      implicit val enc =
        Encs.snapshotIndexedFile
      val sortedRdd = snap.allFilesDistributed.sort("path").rdd
      // global ranks and byte prefix sums without a single-partition
      // window: per-partition totals to the driver (O(partitions)), then
      // each partition numbers its slice from the scanned prefix
      val stats = sortedRdd.mapPartitionsWithIndex { (pi, it) =>
        var n = 0L
        var b = 0L
        it.foreach { a => n += 1; b += a.size }
        Iterator((pi, n, b))
      }.collect().sortBy(_._1)
      val idxPrefix = stats.scanLeft(0L)(_ + _._2).toArray
      val bytePrefix = stats.scanLeft(0L)(_ + _._3).toArray
      val indexed = spark.createDataset(
        sortedRdd.mapPartitionsWithIndex { (pi, it) =>
          var idx = idxPrefix(pi)
          var cum = bytePrefix(pi)
          it.map { a =>
            idx += 1
            cum += a.size
            SnapshotIndexedFile(idx - 1, cum, a)
          }
        })(enc)
      val kept =
        if (persist)
          indexed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else indexed
      val c = SnapshotCursor(v, idxPrefix.last, kept)
      if (persist) snapshotCursor = Some(c)
      c
  }

  /** Budget cut for the snapshot drain: admit files [from, to) of the
    * pinned snapshot's path order, ending the drain (plain boundary
    * offset, which the commit walk then resumes from) when the snapshot
    * is exhausted. Unbudgeted triggers (ReadAllAvailable with no
    * options) serve the whole snapshot in one batch, the pre-chunking
    * behavior. */
  private def snapshotDrainEnd(v: Long, from: Long, fileBudget: Option[Int],
                               byteBudget: Option[Long]): DeltaSourceOffset = {
    if (fileBudget.isEmpty && byteBudget.isEmpty) {
      return DeltaSourceOffset.boundary(v)
    }
    // whole-snapshot fast path: nothing to chunk, skip the cursor build
    // (numOfFiles/sizeInBytes are one cached aggregate on the state)
    if (from == 0L) {
      val snap = deltaLog.getSnapshotForVersionAsOf(v)
      if (fileBudget.forall(snap.numOfFiles <= _) &&
          byteBudget.forall(snap.sizeInBytes <= _)) {
        return DeltaSourceOffset.boundary(v)
      }
    }
    val cur = cursorFor(v)
    if (from >= cur.total) return DeltaSourceOffset.boundary(v)
    val admitted =
      if (byteBudget.isEmpty) {
        // file-only budget: ranks are dense, so the cut is arithmetic —
        // ZERO jobs per trigger (a 10M-file drain at budget 1000 would
        // otherwise pay 10k count jobs)
        math.min(fileBudget.get.toLong, cur.total - from)
      } else {
        // byte budget: the whole cut CHAIN is precomputed by one
        // streaming pass (VERDICT r14 #4 — a 1M-file drain at a byte
        // budget previously paid ~one count job per trigger); a `from`
        // on the chain cuts with zero jobs. Off-chain (a restart whose
        // offset came from a different budget) falls back to the
        // original head+count pair for that trigger.
        val onChain: Option[Long] =
          cutChainFor(cur, fileBudget, byteBudget).flatMap { cuts =>
            val i = java.util.Arrays.binarySearch(cuts, from)
            if (i >= 0 && i + 1 < cuts.length) Some(cuts(i + 1) - from)
            else None
          }
        onChain.getOrElse {
          val startCum: Long =
            if (from == 0L) 0L
            else cur.indexed.filter(_.idx == from - 1).head().cumBytes
          val fCap =
            fileBudget.map(f => from + f.toLong).getOrElse(Long.MaxValue)
          // cumBytes is monotone in idx, so the byte filter keeps a
          // contiguous prefix and count() IS the admitted run length
          cur.indexed.filter { x =>
            x.idx >= from && x.idx < fCap &&
              byteBudget.forall(b => x.cumBytes - startCum <= b)
          }.count()
        }
      }
    val to = from + math.max(1L, admitted) // always make progress
    if (to >= cur.total) DeltaSourceOffset.boundary(v)
    else DeltaSourceOffset(v, to, isSnapshot = true)
  }

  /** The budget's full chunk-boundary chain over the cursor, computed by
    * ONE pass streaming only (idx, cumBytes) pairs to the driver in rank
    * order — O(#chunks) retained memory, never the file objects. Exactly
    * mirrors the per-trigger rule: a chunk admits files while
    * `idx < start + fileBudget` and `cumBytes - cum(start-1) <= bytes`,
    * and always admits its first file. Returns None (per-trigger
    * fallback) when the budgets thrash mid-drain, the chain would exceed
    * the sanity cap, or the stream arrives out of rank order. */
  private def cutChainFor(cur: SnapshotCursor, fileBudget: Option[Int],
                          byteBudget: Option[Long]): Option[Array[Long]] = {
    cursorCuts match {
      case Some((f, b, cuts)) if f == fileBudget && b == byteBudget =>
        return Some(cuts)
      case Some(_) if cutsRebuilt => return None // budgets thrash: disable
      case Some(_) => cutsRebuilt = true
      case None =>
    }
    val bytes = byteBudget.get
    val maxCuts = 4 * 1000 * 1000 // a drain with more triggers is broken
    val cuts = scala.collection.mutable.ArrayBuffer(0L)
    var chunkStart = 0L
    var startCum = 0L
    var prevCum = 0L
    var expect = 0L
    var ok = true
    // stream ONLY (idx, cumBytes) — never the AddFile payloads — in the
    // cursor's own partition order (a narrow projection preserves it;
    // the `expect` check below turns any violation into a safe fallback)
    implicit val pairEnc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong)
    val it = cur.indexed.map(x => (x.idx, x.cumBytes))(pairEnc)
      .toLocalIterator()
    while (ok && it.hasNext) {
      val (idx, cum) = it.next()
      if (idx != expect || cuts.size >= maxCuts) { ok = false }
      else {
        expect += 1
        val fCapHit = fileBudget.exists(f => idx - chunkStart >= f.toLong)
        val byteHit = cum - startCum > bytes
        if (fCapHit || (byteHit && idx > chunkStart)) {
          // this file starts the NEXT chunk (admit-at-least-one keeps a
          // lone over-budget file in its own chunk instead of stalling)
          cuts += idx
          chunkStart = idx
          startCum = prevCum
        }
        prevCum = cum
      }
    }
    if (!ok || expect != cur.total) return None
    cuts += cur.total
    val arr = cuts.toArray
    cursorCuts = Some((fileBudget, byteBudget, arr))
    Some(arr)
  }

  /** The admitted slice [startOff.index, endOff.index) of the pinned
    * snapshot, collected to the driver — O(budget) files, the chunking
    * contract. A boundary end means the FINAL slice; the cursor is
    * released after serving it (a restart replaying the final batch just
    * rebuilds it). */
  private def snapshotSlice(startOff: Option[DeltaSourceOffset],
                            endOff: DeltaSourceOffset): (Long, Seq[AddFile]) = {
    val v = endOff.version
    // a restart replaying the FINAL slice has no further use for the
    // cursor — build it transient instead of persist-then-unpersist
    val finalSliceOnly = !endOff.isSnapshot && snapshotCursor.isEmpty
    val cur = cursorFor(v, persist = !finalSliceOnly)
    val from = startOff.filter(_.isSnapshot).map(_.index).getOrElse(0L)
    val until = if (endOff.isSnapshot) endOff.index else cur.total
    val files = cur.indexed
      .filter(x => x.idx >= from && x.idx < until)
      .collect().sortBy(_.idx).map(_.add).toSeq
    if (!endOff.isSnapshot) {
      cur.indexed.unpersist()
      snapshotCursor = None
    }
    (v, files)
  }

  /** Walk the range (base, head] until a data-file or byte budget is
    * exhausted. Non-CDF streams stop MID-version when a commit is larger
    * than the remaining budget (sub-version offset); CDF streams clamp
    * to version boundaries, always admitting at least one version. Every
    * commit is STREAMED — this walk retains no actions at all, so a
    * 500k-add backfill commit costs one line-scan, not 500k driver
    * objects (FileCountScaleSpec pins this) — and chunked versions
    * resume through the byte-offset memo instead of re-scanning. */
  private def cappedEnd(base: DeltaSourceOffset, head: Long,
                        fileBudget: Option[Int],
                        byteBudget: Option[Long]): DeltaSourceOffset = {
    var files = 0L
    var bytes = 0L
    var end = base
    var done = false
    val startV = if (base.isVersionBoundary) base.version + 1 else base.version
    val commitFiles = deltaLog.listChangeFiles(
      startV, failOnDataLoss, Some(head), Some(head))
    val itf = commitFiles.iterator
    while (!done && itf.hasNext) {
      val fstat = itf.next()
      val v = FileNames.deltaVersion(fstat.getPath)
      val skip =
        if (!base.isVersionBoundary && v == base.version) base.index else 0L
      if (readChangeFeed) {
        // CDF admission: classify the version in one memo-aware pass.
        // PURE-add versions (the backfill shape) chunk file-granularly —
        // a slice of derived inserts is well-defined — while versions
        // carrying change files or removes clamp to the version boundary
        // (their change rows derive from the whole version together)
        var admittedTo = skip
        var stopped = false
        def admit(idx: Long, a: AddFile): Boolean = {
          val over = fileBudget.exists(files + 1 > _) ||
            byteBudget.exists(bytes + a.size > _)
          if (over && (files > 0 || bytes > 0L)) { stopped = true; false }
          else { files += 1; bytes += a.size; admittedTo = idx + 1; true }
        }
        val memo = walkMemo.filter(_.version == v).getOrElse(
          fullScan(fstat.getPath, v, sanitize = false)((_, _) => ()))
        if (memo.pureAdds) {
          if (!seekWalk(fstat.getPath, memo, skip)(admit)) {
            walkMemo = None
            admittedTo = skip; stopped = false
            fullScan(fstat.getPath, v, sanitize = false) { (idx, a) =>
              if (idx >= skip && !stopped) { admit(idx, a); () }
            }
          }
          if (stopped) {
            done = true
            if (admittedTo > skip) {
              end =
                if (admittedTo >= memo.totalAdds) DeltaSourceOffset.boundary(v)
                else DeltaSourceOffset(v, admittedTo)
            }
          } else {
            end = DeltaSourceOffset.boundary(v)
          }
        } else if (memo.sawCdc) {
          // cdc-file version (the DML shape): its CDF output is exactly
          // its AddCDCFiles, each independent — chunk by cdc index
          // through the same byte-offset memo, so a giant single-DML
          // commit's change feed drains bounded (VERDICT r13 #3)
          var cdcTo = skip
          var cdcStopped = false
          def admitCdc(idx: Long, c: AddCDCFile): Boolean = {
            val over = fileBudget.exists(files + 1 > _) ||
              byteBudget.exists(bytes + c.size > _)
            if (over && (files > 0 || bytes > 0L)) { cdcStopped = true; false }
            else { files += 1; bytes += c.size; cdcTo = idx + 1; true }
          }
          if (!seekWalkCdc(fstat.getPath, memo, skip)(admitCdc)) {
            walkMemo = None
            cdcTo = skip; cdcStopped = false
            fullScan(fstat.getPath, v, sanitize = false)(
              (_, _) => (),
              (idx, c) => if (idx >= skip && !cdcStopped) {
                admitCdc(idx, c); ()
              })
          }
          if (cdcStopped) {
            done = true
            if (cdcTo > skip) {
              end =
                if (cdcTo >= memo.totalCdc) DeltaSourceOffset.boundary(v)
                else DeltaSourceOffset(v, cdcTo)
            }
          } else {
            end = DeltaSourceOffset.boundary(v)
          }
        } else if (memo.deleteOnly) {
          // delete-only version (partition delete / retention): each
          // remove independently derives that file's delete rows — chunk
          // by remove index (derived deletes READ the removed parquet,
          // so removes are files-to-read and budget like any other)
          var rmTo = skip
          var rmStopped = false
          def admitRemove(idx: Long, r: RemoveFile): Boolean = {
            val sz = r.size.getOrElse(0L)
            val over = fileBudget.exists(files + 1 > _) ||
              byteBudget.exists(bytes + sz > _)
            if (over && (files > 0 || bytes > 0L)) { rmStopped = true; false }
            else { files += 1; bytes += sz; rmTo = idx + 1; true }
          }
          if (!seekWalkRemoves(fstat.getPath, memo, skip)(admitRemove)) {
            walkMemo = None
            rmTo = skip; rmStopped = false
            fullScan(fstat.getPath, v, sanitize = false)(
              (_, _) => (), (_, _) => (),
              (idx, r) => if (idx >= skip && !rmStopped) {
                admitRemove(idx, r); ()
              })
          }
          if (rmStopped) {
            done = true
            if (rmTo > skip) {
              end =
                if (rmTo >= memo.totalRemoves) DeltaSourceOffset.boundary(v)
                else DeltaSourceOffset(v, rmTo)
            }
          } else {
            end = DeltaSourceOffset.boundary(v)
          }
        } else {
          // adds AND removes without change files: the CDF read of such
          // a version refuses downstream (rewrite without change files);
          // admit whole so the refusal surfaces, budget-counted
          val vFiles = memo.totalAdds + memo.totalRemoves
          val vBytes = memo.addBytes + memo.removeBytes
          val over = fileBudget.exists(files + vFiles > _) ||
            byteBudget.exists(bytes + vBytes > _)
          if (end != base && over) done = true
          else {
            end = DeltaSourceOffset.boundary(v)
            files += vFiles; bytes += vBytes
            if (over) done = true
          }
        }
      } else {
        // file-granular admission with sub-version chunking; a memo'd
        // version resumes by seek, costing O(admitted) not O(commit)
        var admittedTo = skip
        var stopped = false
        def admit(idx: Long, a: AddFile): Boolean = {
          val over = fileBudget.exists(files + 1 > _) ||
            byteBudget.exists(bytes + a.size > _)
          // always admit at least one file per trigger
          if (over && (files > 0 || bytes > 0L)) { stopped = true; false }
          else { files += 1; bytes += a.size; admittedTo = idx + 1; true }
        }
        val total = walkMemo.filter(_.version == v) match {
          case Some(m) if seekWalk(fstat.getPath, m, skip)(admit) =>
            m.totalAdds
          case stale =>
            // no memo (or it failed seek validation): one full scan,
            // which also (re)builds the memo for the following chunks
            if (stale.isDefined) walkMemo = None
            admittedTo = skip; stopped = false; // reset a partial seek
            fullScan(fstat.getPath, v, sanitize = false) { (idx, a) =>
              if (idx >= skip && !stopped) { admit(idx, a); () }
            }.totalAdds
        }
        if (stopped) {
          done = true
          if (admittedTo > skip) {
            end = if (admittedTo >= total) DeltaSourceOffset.boundary(v)
                  else DeltaSourceOffset(v, admittedTo)
          } // else: nothing of v admitted — end stays at the prior version
        } else {
          if (admittedTo >= total) end = DeltaSourceOffset.boundary(v)
          else if (admittedTo > skip) end = DeltaSourceOffset(v, admittedTo)
          // version fully consumed (or all remaining adds admitted)
        }
      }
    }
    end
  }

  /** Legacy V1 entry point; the engine calls [[latestOffset]] instead
    * once a source implements SupportsAdmissionControl. */
  override def getOffset: Option[Offset] =
    Option(latestOffset(null, getDefaultReadLimit))
      .map(o => offsetOf(o))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endOff = offsetOf(end)
    val endV = endOff.version
    // keep the rate-limit base correct across restart recovery, where the
    // engine re-plays a pending batch before calling getOffset
    lastReported = Some(lastReported.fold(endOff)(o =>
      if (endOff <= o) o else endOff))
    val startOff: Option[DeltaSourceOffset] = start.map(offsetOf)
      .orElse(startingVersion.map(sv => DeltaSourceOffset.boundary(sv - 1)))
    if (readChangeFeed) return cdfBatch(startOff, endOff)
    if (endOff.isSnapshot || startOff.exists(_.isSnapshot)) {
      // one chunk of the initial-snapshot drain: O(budget) files
      return buildBatchDF(snapshotSlice(startOff, endOff)._2)
    }
    if (startOff.isEmpty) {
      // F1 initial snapshot: plan through the snapshot-backed index so
      // distributed-state tables never collect their file list here.
      // The batch serves the state AT endV through the schema pinned at
      // stream construction — a schema/partitioning change in
      // (initialSnapshot.version, endV] would otherwise be served
      // SILENTLY with the stale schema forever (later batches only scan
      // versions past endV and would never see the Metadata action)
      val snapAtEnd = deltaLog.getSnapshotForVersionAsOf(endV)
      if (snapAtEnd.metadata.schemaString !=
            initialSnapshot.metadata.schemaString ||
          snapAtEnd.metadata.partitionColumns !=
            initialSnapshot.metadata.partitionColumns) {
        throw new UnsupportedOperationException(
          s"Table schema changed between stream start " +
            s"(${initialSnapshot.version}) and the initial snapshot " +
            s"batch ($endV); restart the stream to pick it up")
      }
      return buildSnapshotDF(snapAtEnd)
    }
    buildBatchDF(changedFiles(startOff.get, endOff))
  }

  /** One CDF micro-batch for the offset range (startOff, endOff]
    * (startOff empty → initial snapshot served as inserts at the end
    * version). Sub-version offsets appear only over PURE-add versions
    * (cappedEnd's classification) — those chunks slice the derived
    * inserts through the byte-offset memo, so a giant backfill commit's
    * CDF stream is as bounded as the non-CDF path. */
  private def cdfBatch(startOff: Option[DeltaSourceOffset],
                       endOff: DeltaSourceOffset): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val typeCol = graft.delta.write.CdcWriter.ChangeTypeCol
    val endV = endOff.version
    if (endOff.isSnapshot || startOff.exists(_.isSnapshot)) {
      // chunked initial snapshot served as inserts at the pinned version
      val (v, files) = snapshotSlice(startOff, endOff)
      return buildBatchDF(files)
        .withColumn(typeCol, lit("insert"))
        .withColumn("_commit_version", lit(v))
    }
    if (startOff.isEmpty) {
      return buildSnapshotDF(deltaLog.getSnapshotForVersionAsOf(endV))
        .withColumn(typeCol, lit("insert"))
        .withColumn("_commit_version", lit(endV))
    }
    val fromV =
      if (startOff.get.isVersionBoundary) startOff.get.version + 1
      else startOff.get.version
    // tag the whole batch's files once and plan ≤2 scan relations — a
    // per-version union puts O(versions) nodes in the plan (see
    // [[graft.delta.read.CdfRelation]]). Whole versions are STREAMED
    // into a transient per-version buffer (tagFiles needs a complex
    // version's actions together); chunked pure-add versions retain only
    // their slice. Either way only the TAGGED output is retained across
    // versions.
    var cdcFiles = Vector.empty[AddFile]
    var derived = Vector.empty[AddFile]
    deltaLog.listChangeFiles(fromV, failOnDataLoss, Some(endV), Some(endV))
      .foreach { fstat =>
        val v = FileNames.deltaVersion(fstat.getPath)
        val sliceFrom =
          if (!startOff.get.isVersionBoundary && v == startOff.get.version)
            startOff.get.index
          else 0L
        val sliceUntil =
          if (v == endOff.version) endOff.index else DeltaSourceOffset.END
        if (sliceFrom > 0 || sliceUntil != DeltaSourceOffset.END) {
          // chunk of a pure-add version (insert-derivation slices) or of
          // a cdc-file version (each AddCDCFile independent): memo-aware
          // sliced walk over the relevant index. Classification comes
          // from the commit file itself, so add- vs cdc-indexing of the
          // offset is deterministic across restarts.
          val memo0 = walkMemo.filter(m => m.version == v && m.sanitized)
            .getOrElse(fullScan(fstat.getPath, v, sanitize = true)(
              (_, _) => ()))
          if (memo0.sawCdc) {
            val sliced = Vector.newBuilder[AddCDCFile]
            def take(idx: Long, c: AddCDCFile): Boolean =
              if (idx < sliceUntil) { sliced += c; true } else false
            if (!seekWalkCdc(fstat.getPath, memo0, sliceFrom)(take)) {
              walkMemo = None
              sliced.clear()
              fullScan(fstat.getPath, v, sanitize = true)(
                (_, _) => (),
                (idx, c) => if (idx >= sliceFrom) { take(idx, c); () })
            }
            val (c, d) = graft.delta.read.CdfRelation.tagFiles(
              v, sliced.result(), "stream")
            cdcFiles ++= c
            derived ++= d
          } else if (memo0.deleteOnly) {
            val sliced = Vector.newBuilder[RemoveFile]
            def take(idx: Long, r: RemoveFile): Boolean =
              if (idx < sliceUntil) { sliced += r; true } else false
            if (!seekWalkRemoves(fstat.getPath, memo0, sliceFrom)(take)) {
              walkMemo = None
              sliced.clear()
              fullScan(fstat.getPath, v, sanitize = true)(
                (_, _) => (), (_, _) => (),
                (idx, r) => if (idx >= sliceFrom) { take(idx, r); () })
            }
            val (c, d) = graft.delta.read.CdfRelation.tagFiles(
              v, sliced.result(), "stream")
            cdcFiles ++= c
            derived ++= d
          } else {
            require(memo0.pureAdds,
              s"internal: sub-version CDF offset over version $v, which " +
                "mixes adds and removes without change files")
            val sliced = Vector.newBuilder[AddFile]
            def take(idx: Long, a: AddFile): Boolean =
              if (idx < sliceUntil) { sliced += a; true } else false
            if (!seekWalk(fstat.getPath, memo0, sliceFrom)(take)) {
              walkMemo = None
              sliced.clear()
              fullScan(fstat.getPath, v, sanitize = true) { (idx, a) =>
                if (idx >= sliceFrom) { take(idx, a); () }
              }
            }
            val (c, d) = graft.delta.read.CdfRelation.tagFiles(
              v, sliced.result(), "stream")
            cdcFiles ++= c
            derived ++= d
          }
        } else {
          val actions = deltaLog.streamCommitActions(fstat.getPath) { it =>
            val buf = Vector.newBuilder[Action]
            it.foreach {
              // the same mid-stream sanitation as the non-CDF path: a
              // schema or protocol change invalidates this stream's
              // pinned schema — silently serving old-schema change rows
              // drops new columns
              case m: Metadata if v > initialSnapshot.version &&
                  (m.schemaString != initialSnapshot.metadata.schemaString ||
                    m.partitionColumns !=
                      initialSnapshot.metadata.partitionColumns) =>
                throw new UnsupportedOperationException(
                  s"Detected a schema/metadata change at version $v; " +
                    "restart the stream to pick it up")
              case p: Protocol if v > initialSnapshot.version =>
                // accept any protocol this engine can READ (same rule as
                // the non-CDF path) — a benign feature enablement must
                // not kill only the CDF streams
                require(p.minReaderVersion <= 2 ||
                  (p.minReaderVersion == 3 &&
                    graft.delta.TableFeatures.unsupportedReader(p).isEmpty),
                  s"Unsupported protocol change at version $v: $p")
                buf += p
              case a => buf += a
            }
            buf.result()
          }
          val (c, d) = graft.delta.read.CdfRelation.tagFiles(
            v, actions, "stream")
          cdcFiles ++= c
          derived ++= d
        }
      }
    graft.delta.read.CdfRelation.frame(spark, deltaLog,
      initialSnapshot.metadata, cdcFiles, derived, streaming = true)
      .getOrElse {
        // empty range: an empty streaming frame with the CDF schema
        buildBatchDF(Nil)
          .withColumn(typeCol, lit("insert"))
          .withColumn("_commit_version", lit(endV))
          .filter(lit(false))
      }
  }

  /** F3 change sanitation for the offset range (startOff, endOff].
    * Each commit is STREAMED once: sanitation flags fold as the lines
    * pass and only the admitted SLICE of data AddFiles is retained —
    * for a chunked giant commit the driver holds O(budget) files, never
    * O(commit) (the recurring tail-walker materialization shape; see
    * FileCountScaleSpec's streaming tier). */
  private def changedFiles(startOff: DeltaSourceOffset,
                           endOff: DeltaSourceOffset): Seq[AddFile] = {
    val fromV =
      if (startOff.isVersionBoundary) startOff.version + 1 else startOff.version
    if (fromV > endOff.version) return Nil
    val out = Vector.newBuilder[AddFile]
    deltaLog.listChangeFiles(fromV, failOnDataLoss,
        Some(endOff.version), Some(endOff.version)).foreach { fstat =>
      val v = FileNames.deltaVersion(fstat.getPath)
      // slice bounds for the boundary versions of a chunked range
      val sliceFrom =
        if (!startOff.isVersionBoundary && v == startOff.version)
          startOff.index
        else 0L
      val sliceUntil =
        if (v == endOff.version) endOff.index else DeltaSourceOffset.END
      val sliced = Vector.newBuilder[AddFile]
      def take(idx: Long, a: AddFile): Boolean =
        if (idx < sliceUntil) { sliced += a; true } else false
      // a memo'd+sanitized version serves later chunks by SEEK with the
      // recorded sanitation facts — the first chunk's full scan already
      // ran the Metadata/Protocol checks over the whole file
      val memo = walkMemo.filter(m => m.version == v && m.sanitized) match {
        case Some(m) if seekWalk(fstat.getPath, m, sliceFrom)(take) => m
        case stale =>
          if (stale.isDefined) walkMemo = None
          sliced.clear()
          fullScan(fstat.getPath, v, sanitize = true) { (idx, a) =>
            if (idx >= sliceFrom) { take(idx, a); () }
          }
      }
      val sawAdds = memo.totalAdds > 0
      val sawRemoves = memo.sawRemoves
      if (skipChangeCommits && sawRemoves) {
        // change commits (rewrites AND plain deletes) contribute
        // nothing to the stream — appends-only consumption
      } else {
        if (sawRemoves && sawAdds && !ignoreChanges) {
          throw new UnsupportedOperationException(
            s"Detected a data update at version $v (files rewritten). " +
              "Set ignoreChanges=true to re-emit rewritten files, " +
              "skipChangeCommits=true to skip them, or restart " +
              "from a fresh snapshot")
        }
        if (sawRemoves && !sawAdds && !ignoreDeletes && !ignoreChanges) {
          throw new UnsupportedOperationException(
            s"Detected deleted data at version $v. Set ignoreDeletes=true " +
              "to skip delete-only commits")
        }
        out ++= sliced.result()
      }
    }
    out.result()
  }

  /** Whole-snapshot streaming frame via the snapshot-backed index:
    * in distributed-state mode pruning runs as a Spark job and the file
    * list never materializes on the driver. Files shaded by deletion
    * vectors get the same (file, row_index) anti-filter as batch scans —
    * without it the initial snapshot of a foreign DV table would
    * RESURRECT its deleted rows into the stream. */
  private def buildSnapshotDF(snap: Snapshot): DataFrame = {
    val metadata = initialSnapshot.metadata
    val relation = HadoopFsRelation(
      location = new DeltaFileIndex(spark, snap),
      partitionSchema = metadata.partitionSchema,
      dataSchema = metadata.dataSchema,
      bucketSpec = None,
      fileFormat = new graft.delta.read.GuardedParquetFileFormat(metadata.columnMapping, metadata.fieldIdMapping),
      options = Map.empty)(spark)
    val base = Shims.relationToDataFrame(spark, relation, isStreaming = true)
    val undeleted =
      if (snap.dvCardinality == 0L) base
      else {
        implicit val enc = Encs.addFile
        val dvFiles =
          if (snap.distributedState)
            snap.allFilesDistributed.filter(_.deletionVector.isDefined)
          else spark.createDataset(
            snap.allFiles.filter(_.deletionVector.isDefined))
        graft.delta.read.DvFilter(base, dvFiles, snap.dvCardinality,
          deltaLog.dataPath, deltaLog.hadoopConf)
      }
    undeleted.select(metadata.schema.fieldNames
      .map(org.apache.spark.sql.functions.col).toSeq: _*)
  }

  private def buildBatchDF(files: Seq[AddFile]): DataFrame = {
    val metadata = initialSnapshot.metadata
    val index = new DeltaFileIndex(spark, deltaLog.dataPath, metadata, files)
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = metadata.partitionSchema,
      dataSchema = metadata.dataSchema,
      bucketSpec = None,
      fileFormat = new graft.delta.read.GuardedParquetFileFormat(metadata.columnMapping, metadata.fieldIdMapping),
      options = Map.empty)(spark)
    val df = Shims.relationToDataFrame(spark, relation, isStreaming = true)
    // a re-emitted rewrite (ignoreChanges) may carry a deletion vector;
    // emit the file MINUS its deleted rows, same as a batch read would
    val undeleted = graft.delta.read.DvFilter.forFiles(
      df, files, deltaLog.dataPath, deltaLog.hadoopConf)
    // project the TABLE schema (the source schema may carry CDF columns
    // that only exist after cdfBatch appends them)
    undeleted.select(metadata.schema.fieldNames
      .map(org.apache.spark.sql.functions.col).toSeq: _*)
  }

  /** Offsets arrive as our own type, LongOffset (legacy/bare), or (from
    * the offset log) serialized JSON — all normalize through the parser.
    * (V1 Offset extends OffsetV2, so one signature covers both APIs.) */
  private def offsetOf(o: OffsetV2): DeltaSourceOffset = o match {
    case d: DeltaSourceOffset => d
    case LongOffset(v) => DeltaSourceOffset.boundary(v)
    case other => DeltaSourceOffset.parse(other.json)
  }

  /** A stream stopped or failed mid-initial-snapshot-drain must not leak
    * the persisted cursor sort for the lifetime of the Spark app (ADVICE
    * r14); the drain's own final-slice release handles the happy path. */
  override def stop(): Unit = {
    snapshotCursor.foreach(c =>
      try c.indexed.unpersist() catch { case _: Throwable => })
    snapshotCursor = None
  }
}

object DeltaSource {
  /** Per-trigger data-file admission default (delta-spark's
    * DeltaOptions.MAX_FILE_PER_TRIGGER default): applied when the user
    * sets no explicit rate limit, so no stream ever admits an unbounded
    * batch by default. */
  val DefaultMaxFilesPerTrigger: Int = 1000
}
