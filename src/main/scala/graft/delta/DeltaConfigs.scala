package graft.delta

/** Typed table-configuration registry (SURVEY §2.1 M16; ref
  * DeltaConfig.scala:28-252). Values live in `Metadata.configuration`;
  * interval values accept the protocol's `"interval <n> <unit>"` form. */
case class DeltaConfig[T](
    key: String,
    default: String,
    fromString: String => T,
    validate: T => Boolean = (_: T) => true) {

  def fromMetadata(metadata: Metadata): T = {
    val raw = metadata.configuration.getOrElse(key, default)
    val v = fromString(raw)
    require(validate(v), s"Invalid value '$raw' for table property $key")
    v
  }
}

object DeltaConfigs {

  /** Parse "interval 30 days" / "interval 1 week" → millis
    * (ref util/IntervalUtils.scala — we support the units the reference's
    * configs use). */
  def parseIntervalMillis(s: String): Long = {
    val norm = s.trim.toLowerCase
    val tokens = norm.stripPrefix("interval").trim.split("\\s+")
    require(tokens.length == 2, s"Cannot parse interval: '$s'")
    val n = tokens(0).toLong
    val unit = tokens(1).stripSuffix("s") match {
      case "millisecond" => 1L
      case "second" => 1000L
      case "minute" => 60L * 1000
      case "hour" => 3600L * 1000
      case "day" => 24L * 3600 * 1000
      case "week" => 7L * 24 * 3600 * 1000
      case u => throw new IllegalArgumentException(s"Unknown interval unit $u")
    }
    require(n >= 0, s"Interval must be non-negative: '$s'")
    n * unit
  }

  val LOG_RETENTION: DeltaConfig[Long] = DeltaConfig(
    "delta.logRetentionDuration", "interval 30 days", parseIntervalMillis)

  val TOMBSTONE_RETENTION: DeltaConfig[Long] = DeltaConfig(
    "delta.deletedFileRetentionDuration", "interval 1 week", parseIntervalMillis)

  val CHECKPOINT_INTERVAL: DeltaConfig[Int] = DeltaConfig(
    "delta.checkpointInterval", "10", _.toInt, (_: Int) > 0)

  val ENABLE_EXPIRED_LOG_CLEANUP: DeltaConfig[Boolean] = DeltaConfig(
    "delta.enableExpiredLogCleanup", "true", _.toBoolean)

  /** Minor log compaction cadence (graft extension over PROTOCOL.md "Log
    * Compaction Files"): every N commits, the post-commit hook writes
    * `{v-N+1}.{v}.compacted.json` so tail replay between checkpoints
    * reads one reconciled file instead of N commits. 0 = off (default);
    * best paired with a checkpointInterval that is a multiple of N. */
  val LOG_COMPACTION_INTERVAL: DeltaConfig[Int] = DeltaConfig(
    "graft.logCompaction.interval", "0", _.toInt,
    // a 1-commit "range" cannot compact anything (compactLog requires
    // end > start): 0 = off, else at least 2
    (v: Int) => v == 0 || v >= 2)

  val IS_APPEND_ONLY: DeltaConfig[Boolean] = DeltaConfig(
    "delta.appendOnly", "false", _.toBoolean)

  /** Write change-data files (AddCDCFile) on DML so `changes()` can serve
    * row-level diffs without reconstructing them from data files. */
  val ENABLE_CHANGE_DATA_FEED: DeltaConfig[Boolean] = DeltaConfig(
    "delta.enableChangeDataFeed", "false", _.toBoolean)

  /** Number of parts for checkpoint parquet (the reference reads
    * multi-part checkpoints; writing them bounds per-task state size at
    * very large file counts). */
  val CHECKPOINT_PARTS: DeltaConfig[Int] = DeltaConfig(
    "delta.checkpointParts", "1", _.toInt, (_: Int) >= 1)

  /** Actions per checkpoint part when AUTO-sizing: a checkpoint holding
    * more actions than this splits into ceil(n / partSize) parts even
    * without an explicit `delta.checkpointParts` (delta-spark's
    * `delta.checkpoint.partSize` semantics) — at billion-file states no
    * single writer or reader task should own the whole state. */
  val CHECKPOINT_PART_SIZE: DeltaConfig[Long] = DeltaConfig(
    "delta.checkpoint.partSize", "1000000", _.toLong, (_: Long) >= 1L)

  /** Adds per V2 SIDECAR when auto-sizing (deliberately much smaller
    * than the classic part size): sidecar granularity is what carry-over
    * trades on — with 1M-add sidecars a 100k-file table gets ONE bucket
    * and every checkpoint rewrites everything, while 64k-add buckets
    * let a single-commit interval rewrite ~64k adds instead of the
    * table. Smaller sidecars cost only file count under `_sidecars/`
    * (reader tasks already scale with parts). */
  val CHECKPOINT_SIDECAR_SIZE: DeltaConfig[Long] = DeltaConfig(
    "delta.checkpoint.sidecarSize", "65536", _.toLong, (_: Long) >= 1L)

  /** Collect per-file min/max/nullCount for only the first N data
    * columns (Delta's delta.dataSkippingNumIndexedCols): on a 1000-column
    * table, unbounded stats make every AddFile JSON line — and the
    * checkpoint — dominated by stats nobody filters on. numRecords is
    * always collected; skipping stays conservative for unindexed
    * columns. */
  val DATA_SKIPPING_NUM_INDEXED_COLS: DeltaConfig[Int] = DeltaConfig(
    "delta.dataSkippingNumIndexedCols", "32", _.toInt, (_: Int) >= 0)

  /** Explicit stats column list (Delta's delta.dataSkippingStatsColumns,
    * comma-separated): when set it REPLACES the positional
    * numIndexedCols rule — on a wide table only the filter columns the
    * workload actually prunes on carry stats, however late they sit in
    * the schema. Empty/unset = positional rule. */
  val DATA_SKIPPING_STATS_COLUMNS: DeltaConfig[Seq[String]] = DeltaConfig(
    "delta.dataSkippingStatsColumns", "",
    s => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq)

  /** Repartition incoming batches to ~targetFileSize outputs BEFORE the
    * write (Delta's optimizeWrite): ingest is where the small-file
    * problem starts — a 200-task job appending 10 MB otherwise creates
    * 200 files of 50 KB each commit. */
  val OPTIMIZE_WRITE: DeltaConfig[Boolean] = DeltaConfig(
    "delta.autoOptimize.optimizeWrite", "false", _.toBoolean)

  /** Bin-pack small files automatically after each batch write commit
    * (best-effort; conflicts never fail the triggering write). Where
    * optimizeWrite shapes ONE batch's output, autoCompact folds the
    * accumulated small files of MANY commits back toward target size. */
  val AUTO_COMPACT: DeltaConfig[Boolean] = DeltaConfig(
    "delta.autoOptimize.autoCompact", "false", _.toBoolean)

  /** Target data-file size for optimizeWrite and OPTIMIZE defaults. */
  val TARGET_FILE_SIZE: DeltaConfig[Long] = DeltaConfig(
    "delta.targetFileSize", (128L * 1024 * 1024).toString,
    _.toLong, (_: Long) > 0)

  /** DELETE shades files with deletion vectors (merge-on-read) instead of
    * rewriting them — the protocol's deletionVectors table feature; the
    * first shading commit auto-upgrades the protocol to reader 3/writer 7
    * with the feature listed. OPTIMIZE purges shaded files back to plain
    * parquet. */
  val ENABLE_DELETION_VECTORS: DeltaConfig[Boolean] = DeltaConfig(
    "delta.enableDeletionVectors", "false", _.toBoolean)

  /** Commits carry a monotonic `inCommitTimestamp` in their CommitInfo
    * (PROTOCOL.md "In-Commit Timestamps", writer feature
    * inCommitTimestamp): timestamp queries — time travel, history — use
    * it instead of file modification times, which object stores may
    * rewrite and clock skew may reorder. */
  val ENABLE_IN_COMMIT_TIMESTAMPS: DeltaConfig[Boolean] = DeltaConfig(
    "delta.enableInCommitTimestamps", "false", _.toBoolean)

  /** Row tracking (PROTOCOL.md "Row Tracking", writer feature
    * rowTracking): every AddFile carries a `baseRowId` reserving
    * [baseRowId, baseRowId + numRecords) from the table-wide counter in
    * the `delta.rowTracking` domain, plus the `defaultRowCommitVersion`
    * that added it — so every row has a stable (fresh-on-rewrite) id =
    * baseRowId + its position, readable without any per-row storage. */
  val ENABLE_ROW_TRACKING: DeltaConfig[Boolean] = DeltaConfig(
    "delta.enableRowTracking", "false", _.toBoolean)

  /** Which checkpoint format maintenance writes: "classic" (default) or
    * "v2" (uuid-named main file + sidecars — required by tables created
    * with the v2Checkpoint feature and this policy). */
  val CHECKPOINT_POLICY: DeltaConfig[String] = DeltaConfig(
    "delta.checkpointPolicy", "classic", identity,
    (v: String) => v == "classic" || v == "v2")

  /** Set when ICT is enabled AFTER table creation: the first version /
    * timestamp with an inCommitTimestamp (timestamp queries below the
    * enablement version fall back to file modification times). */
  val IctEnablementVersionKey = "delta.inCommitTimestampEnablementVersion"
  val IctEnablementTimestampKey = "delta.inCommitTimestampEnablementTimestamp"

  /** Checkpoint protection (writer feature `checkpointProtection`):
    * commits and checkpoints below this version may only be cleaned up
    * ALL AT ONCE (against a retained checkpoint at or past the boundary)
    * — the guard for tables whose early history is not reconstructible
    * from commits alone (e.g. converted coordinated-commits tables). */
  val REQUIRE_CHECKPOINT_PROTECTION: DeltaConfig[Long] = DeltaConfig(
    "delta.requireCheckpointProtectionBeforeVersion", "0", _.toLong)

  /** Coordinated commits (delta-spark's multi-writer object-store
    * direction): the table property naming the commit coordinator.
    * delta-spark writes the `-preview` key; both spellings are
    * accepted. The name resolves through
    * [[graft.delta.storage.CommitCoordinator.forName]]. */
  def commitCoordinatorName(metadata: Metadata): Option[String] =
    metadata.configuration
      .get("delta.coordinatedCommits.commitCoordinator-preview")
      .orElse(metadata.configuration
        .get("delta.coordinatedCommits.commitCoordinator"))

  /** Backfill cadence for coordinated commits (delta-spark's commit
    * owners take a backfillBatchSize parameter; here it is a table
    * property so every coordinated writer/reader of the table agrees).
    * 1 (the default) publishes each commit into the plain log inline;
    * k > 1 defers the rename until k commits are pending — coordinated
    * readers serve the deferred tail from the staged layout, plain
    * readers see only the backfilled prefix. */
  def backfillBatchSize(metadata: Metadata): Int =
    metadata.configuration
      .get("delta.coordinatedCommits.backfillBatchSize")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .filter(_ >= 1)
      .getOrElse(1)
}
