package graft.delta.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
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
    options: Map[String, String]) extends Source {

  private val spark: SparkSession = sqlContext.sparkSession
  private val ignoreDeletes =
    options.getOrElse("ignoreDeletes", "false").toBoolean
  private val ignoreChanges =
    options.getOrElse("ignoreChanges", "false").toBoolean

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
        java.sql.Timestamp.valueOf(ts).getTime)
    })
  }

  override val schema: StructType = initialSnapshot.metadata.schema

  /** Rate limit: cap each micro-batch at this many data AddFiles (always
    * at least one version per batch). After a restart the first batch is
    * uncapped — the V1 Source API doesn't hand back the committed offset
    * before the first getOffset, and correctness (exactly-once by version
    * range) never depends on the cap. */
  private val maxFilesPerTrigger: Option[Int] =
    options.get("maxFilesPerTrigger").map(_.toInt)
  private var lastReported: Option[Long] = None

  override def getOffset: Option[Offset] = {
    val head = deltaLog.update().version
    if (head < 0) return None
    val base = lastReported.orElse(startingVersion.map(_ - 1))
    val end = (base, maxFilesPerTrigger) match {
      case (Some(b), Some(budget)) if head > b =>
        var endV = b
        var files = 0
        val it = deltaLog.getChanges(b + 1).takeWhile(_._1 <= head)
        var done = false
        while (!done && it.hasNext) {
          val (v, actions) = it.next()
          val n = actions.count {
            case a: AddFile => a.dataChange
            case _ => false
          }
          // the first version always fits (a batch must make progress)
          if (endV > b && files + n > budget) done = true
          else { endV = v; files += n }
        }
        endV
      case _ => head
    }
    startingVersion match {
      case Some(sv) if end < sv => None // nothing at or after the start yet
      case _ =>
        lastReported = Some(end)
        Some(LongOffset(end))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = asVersion(end)
    // keep the rate-limit base correct across restart recovery, where the
    // engine re-plays a pending batch before calling getOffset
    lastReported = Some(lastReported.fold(endV)(math.max(_, endV)))
    val files = start match {
      case Some(s) =>
        changedFiles(asVersion(s) + 1, endV)
      case None => startingVersion match {
        case Some(sv) => changedFiles(sv, endV)
        case None =>
          // F1: initial snapshot — the table's full state at endV
          deltaLog.getSnapshotForVersionAsOf(endV).allFiles
      }
    }
    buildBatchDF(files)
  }

  /** F3 change sanitation for versions [fromV, toV]. */
  private def changedFiles(fromV: Long, toV: Long): Seq[AddFile] = {
    if (fromV > toV) return Nil
    deltaLog.getChanges(fromV).takeWhile(_._1 <= toV).flatMap {
      case (v, actions) =>
        val adds = actions.collect { case a: AddFile if a.dataChange => a }
        val removes = actions.collect { case r: RemoveFile if r.dataChange => r }
        actions.foreach {
          case _: Metadata if v > initialSnapshot.version =>
            throw new UnsupportedOperationException(
              s"Detected a schema/metadata change at version $v; restart the " +
                "stream to pick it up")
          case p: Protocol =>
            require(p.minReaderVersion <= 1,
              s"Unsupported protocol change at version $v: $p")
          case _ =>
        }
        if (removes.nonEmpty && adds.nonEmpty && !ignoreChanges) {
          throw new UnsupportedOperationException(
            s"Detected a data update at version $v (files rewritten). " +
              "Set ignoreChanges=true to re-emit rewritten files, or restart " +
              "from a fresh snapshot")
        }
        if (removes.nonEmpty && adds.isEmpty && !ignoreDeletes && !ignoreChanges) {
          throw new UnsupportedOperationException(
            s"Detected deleted data at version $v. Set ignoreDeletes=true " +
              "to skip delete-only commits")
        }
        adds
    }.toVector
  }

  private def buildBatchDF(files: Seq[AddFile]): DataFrame = {
    val metadata = initialSnapshot.metadata
    val index = new DeltaFileIndex(spark, deltaLog.dataPath, metadata, files)
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = metadata.partitionSchema,
      dataSchema = metadata.dataSchema,
      bucketSpec = None,
      fileFormat = new graft.delta.read.GuardedParquetFileFormat,
      options = Map.empty)(spark)
    val df = Shims.relationToDataFrame(spark, relation, isStreaming = true)
    df.select(schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
  }

  private def asVersion(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.toLong
  }

  override def stop(): Unit = ()
}
