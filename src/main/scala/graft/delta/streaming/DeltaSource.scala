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

/** Structured-Streaming micro-batch source over a Delta table
  * (SURVEY §2.4 F1–F6: the Flink continuous source re-expressed on
  * Spark's micro-batch executor).
  *
  * The offset IS the table version — Spark's offset log replaces the
  * Flink enumerator's {version, processedPaths} checkpoints (F5), and
  * task scheduling replaces split assignment. A batch for offset range
  * (v1, v2] is the union of sanitized AddFiles committed in those
  * versions, planned through the same [[DeltaFileIndex]] as batch reads
  * (vectorized parquet, pushdown, pruning all apply).
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

  /** Rate limit: cap each micro-batch at this many data AddFiles (always
    * at least one version per batch — a batch must make progress). With
    * [[SupportsAdmissionControl]] the engine hands the committed start
    * offset to [[latestOffset]], so the cap holds across restarts too
    * (the reference's bounded/continuous split, DeltaSource.java:121-150,
    * maps onto ReadLimit-driven admission).
    *
    * KNOWN BOUND: the INITIAL-SNAPSHOT batch (no startingVersion) is
    * served whole — version-granular offsets cannot split one snapshot.
    * Splitting it needs (version, fileIndex) offsets (delta-spark's
    * IndexedFile scheme); until then, bound first-batch size by starting
    * from a version (startingVersion) or a fresh table. */
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
  private var lastReported: Option[Long] = None

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
      case Nil => ReadLimit.allAvailable()
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
    val base: Option[Long] = Option(startOffset).map(versionOf)
      .orElse(lastReported)
      .orElse(startingVersion.map(_ - 1))
    val (fileBudget, byteBudget) = budgets(limit)
    val end = base match {
      case Some(b) if head > b && (fileBudget.isDefined || byteBudget.isDefined) =>
        cappedEnd(b, head, fileBudget, byteBudget)
      case _ => head
    }
    startingVersion match {
      case Some(sv) if end < sv => null // nothing at or after the start yet
      case _ =>
        lastReported = Some(end)
        LongOffset(end)
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

  /** Walk versions (base, head] until a data-file or byte budget is
    * exhausted. */
  private def cappedEnd(base: Long, head: Long,
                        fileBudget: Option[Int],
                        byteBudget: Option[Long]): Long = {
    var endV = base
    var files = 0
    var bytes = 0L
    val it = deltaLog.getChanges(base + 1, failOnDataLoss, Some(head), Some(head))
    var done = false
    while (!done && it.hasNext) {
      val (v, actions) = it.next()
      val dataAdds = actions.collect {
        case a: AddFile if a.dataChange => a
      }
      val n = dataAdds.size
      val sz = dataAdds.map(_.size).sum
      val over = fileBudget.exists(files + n > _) ||
        byteBudget.exists(bytes + sz > _)
      // the first version always fits (a batch must make progress)
      if (endV > base && over) done = true
      else { endV = v; files += n; bytes += sz }
    }
    endV
  }

  /** Legacy V1 entry point; the engine calls [[latestOffset]] instead
    * once a source implements SupportsAdmissionControl. */
  override def getOffset: Option[Offset] =
    Option(latestOffset(null, getDefaultReadLimit))
      .map(o => LongOffset(versionOf(o)))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = asVersion(end)
    // keep the rate-limit base correct across restart recovery, where the
    // engine re-plays a pending batch before calling getOffset
    lastReported = Some(lastReported.fold(endV)(math.max(_, endV)))
    val fromV = start.map(asVersion(_) + 1)
      .orElse(startingVersion).getOrElse(-1L)
    if (readChangeFeed) return cdfBatch(fromV, endV)
    if (fromV < 0) {
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
    buildBatchDF(changedFiles(fromV, endV))
  }

  /** One CDF micro-batch for versions [fromV, endV] (fromV < 0 → initial
    * snapshot served as inserts at endV). */
  private def cdfBatch(fromV: Long, endV: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val typeCol = graft.delta.write.CdcWriter.ChangeTypeCol
    if (fromV < 0) {
      return buildSnapshotDF(deltaLog.getSnapshotForVersionAsOf(endV))
        .withColumn(typeCol, lit("insert"))
        .withColumn("_commit_version", lit(endV))
    }
    // tag the whole batch's files once and plan ≤2 scan relations — a
    // per-version union puts O(versions) nodes in the plan (see
    // [[graft.delta.read.CdfRelation]])
    var cdcFiles = Vector.empty[AddFile]
    var derived = Vector.empty[AddFile]
    deltaLog.getChanges(fromV, failOnDataLoss, Some(endV), Some(endV))
      .foreach { case (v, actions) =>
        // the same mid-stream sanitation as the non-CDF path: a schema
        // or protocol change invalidates this stream's pinned schema —
        // silently serving old-schema change rows drops new columns
        actions.foreach {
          case m: Metadata if v > initialSnapshot.version &&
              (m.schemaString != initialSnapshot.metadata.schemaString ||
                m.partitionColumns !=
                  initialSnapshot.metadata.partitionColumns) =>
            throw new UnsupportedOperationException(
              s"Detected a schema/metadata change at version $v; " +
                "restart the stream to pick it up")
          case p: Protocol if v > initialSnapshot.version =>
            // accept any protocol this engine can READ (same rule as the
            // non-CDF path) — a benign feature enablement must not kill
            // only the CDF streams
            require(p.minReaderVersion <= 2 ||
              (p.minReaderVersion == 3 &&
                graft.delta.TableFeatures.unsupportedReader(p).isEmpty),
              s"Unsupported protocol change at version $v: $p")
          case _ =>
        }
        val (c, d) = graft.delta.read.CdfRelation.tagFiles(v, actions, "stream")
        cdcFiles ++= c
        derived ++= d
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

  /** F3 change sanitation for versions [fromV, toV]. */
  private def changedFiles(fromV: Long, toV: Long): Seq[AddFile] = {
    if (fromV > toV) return Nil
    deltaLog.getChanges(fromV, failOnDataLoss, Some(toV), Some(toV)).flatMap {
      case (v, actions) =>
        val adds = actions.collect { case a: AddFile if a.dataChange => a }
        val removes = actions.collect { case r: RemoveFile if r.dataChange => r }
        actions.foreach {
          // property-only metadata (retention tweaks etc.) with an
          // unchanged schema and partitioning must NOT kill the stream —
          // only changes that invalidate the pinned schema do (the same
          // comparison the CDF path makes)
          case m: Metadata if v > initialSnapshot.version &&
              (m.schemaString != initialSnapshot.metadata.schemaString ||
                m.partitionColumns !=
                  initialSnapshot.metadata.partitionColumns) =>
            throw new UnsupportedOperationException(
              s"Detected a schema/metadata change at version $v; restart the " +
                "stream to pick it up")
          case p: Protocol =>
            // accept any protocol this engine can READ (mirrors
            // Snapshot.assertReadable): reader 1-2, or reader 3 with
            // every advertised feature implemented
            require(p.minReaderVersion <= 2 ||
              (p.minReaderVersion == 3 &&
                graft.delta.TableFeatures.unsupportedReader(p).isEmpty),
              s"Unsupported protocol change at version $v: $p")
          case _ =>
        }
        if (skipChangeCommits && removes.nonEmpty) {
          // change commits (rewrites AND plain deletes) contribute
          // nothing to the stream — appends-only consumption
          Nil
        } else {
          if (removes.nonEmpty && adds.nonEmpty && !ignoreChanges) {
            throw new UnsupportedOperationException(
              s"Detected a data update at version $v (files rewritten). " +
                "Set ignoreChanges=true to re-emit rewritten files, " +
                "skipChangeCommits=true to skip them, or restart " +
                "from a fresh snapshot")
          }
          if (removes.nonEmpty && adds.isEmpty && !ignoreDeletes && !ignoreChanges) {
            throw new UnsupportedOperationException(
              s"Detected deleted data at version $v. Set ignoreDeletes=true " +
                "to skip delete-only commits")
          }
          adds
        }
    }.toVector
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
        implicit val enc = org.apache.spark.sql.Encoders.product[AddFile]
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

  private def asVersion(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.toLong
  }

  /** V2 offsets arrive as LongOffset or (from the offset log) serialized. */
  private def versionOf(o: OffsetV2): Long = o match {
    case LongOffset(v) => v
    case other => other.json.toLong
  }

  override def stop(): Unit = ()
}
