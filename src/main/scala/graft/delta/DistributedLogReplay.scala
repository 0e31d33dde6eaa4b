package graft.delta

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** State reconstruction as a Spark job — the distributed variant of
  * [[InMemoryLogReplay]] (SURVEY §2.1 M3: "Dataset[SingleAction] →
  * version column → newest-wins window → anti-join tombstones").
  *
  * The driver-side fold holds every live AddFile in memory; at 100 TB a
  * table can carry millions of files, so this variant reads the checkpoint
  * parquet and the JSON commits after it as a distributed
  * Dataset[SingleAction] (versions parsed from commit file names), keeps
  * the newest file action per canonicalized path with one window, and
  * returns the survivors that are adds. One shuffle, partitioned by path —
  * no driver materialization until the caller asks for it.
  *
  * Tie-break note: the protocol forbids an add and a remove of the same
  * path within one commit, so (path, version) is unique per action kind;
  * we still order removes after adds at equal version (remove wins) to
  * fail safe on non-conforming logs.
  */
object DistributedLogReplay {

  /** (add, remove) slice of the action envelope — the only columns the
    * file-state fold reads; foreign checkpoints may carry extra columns
    * with types outside our model (e.g. commitInfo.timestamp). */
  private case class FileSlice(
      add: Option[AddFile] = None, remove: Option[RemoveFile] = None)
  private lazy val sliceEncCached = Encoders.product[FileSlice]

  def activeFiles(spark: SparkSession, segment: LogSegment): Dataset[AddFile] = {
    implicit val sliceEnc = sliceEncCached
    implicit val addEnc = Encs.addFile

    // a coordinated table's DEFERRED commits exist only in the staged
    // layout; executors read the physical staged path (the listing's
    // StagedFileStatus carries it — its logical path does not exist yet)
    val commitPaths = segment.deltas.map {
      case s: graft.delta.storage.StagedFileStatus => s.stagedPath.toString
      case f => f.getPath.toString
    }
    val commits =
      if (commitPaths.isEmpty) spark.emptyDataset[FileSlice].toDF()
      else spark.read.schema(sliceEnc.schema).json(commitPaths: _*)
        // a compacted range file ({start}.{end}.compacted.json) folds at
        // its END version — its content is the range's newest-wins
        // reconciliation (same keying as Snapshot.deltaVersions).
        // Staged names (`_staged_commits/<v>.<uuid>.json`) MUST match
        // first: a uuid ending in digits would satisfy the plain
        // `(\d+).json` pattern with the wrong version
        .withColumn("version",
          coalesce(
            nullif(regexp_extract(input_file_name(),
              """_staged_commits/(\d+)\.""", 1), lit("")),
            nullif(regexp_extract(input_file_name(),
              """(\d+)\.compacted\.json""", 1), lit("")),
            nullif(regexp_extract(input_file_name(),
              """(\d+)\.json""", 1), lit("")))
          .cast("long"))

    val checkpoint = segment.checkpointVersion match {
      case Some(cpV) if V2Checkpoints.isV2Segment(segment) =>
        // V2 checkpoint: file actions live in the sidecar parquets (or
        // inline in the main file when there are none) — the main parse
        // is sidecar-count-bounded, the sidecars read as a Spark job
        val main = V2Checkpoints.readMain(spark, segment.logPath,
          segment.checkpoint.head, spark.sessionState.newHadoopConf())
        val inline = spark.createDataset(main.actions.collect {
          case a: AddFile => FileSlice(add = Some(a))
          case r: RemoveFile => FileSlice(remove = Some(r))
        })
        val sidecars = main.sidecars.map(s =>
          V2Checkpoints.sidecarPath(segment.logPath, s).toString)
        val fromSidecars =
          if (sidecars.isEmpty) spark.emptyDataset[FileSlice].toDF()
          else spark.read.schema(sliceEnc.schema).parquet(sidecars: _*)
        inline.toDF().unionByName(fromSidecars, allowMissingColumns = true)
          .withColumn("version", lit(cpV))
      case Some(cpV) =>
        spark.read.schema(sliceEnc.schema)
          .parquet(segment.checkpoint.map(_.getPath.toString): _*)
          .withColumn("version", lit(cpV))
      case None => spark.emptyDataset[FileSlice].toDF()
        .withColumn("version", lit(-1L))
    }

    val all = checkpoint.unionByName(commits, allowMissingColumns = true)
    // The SAME canonicalization as the driver replay (LogReplay
    // .canonicalizer: fs-qualify bare absolute paths, URI-normalize the
    // rest). url_decode would collapse 'a+b' and 'a b' into one key and
    // silently drop a file; URI.normalize alone would KEEP '/x' and
    // 'file:/x' apart and fail to cancel an add with its remove.
    val fsUri = segment.logPath.getFileSystem(
      spark.sessionState.newHadoopConf()).getUri
    val canonicalFn = LogReplay.canonicalizer(fsUri)
    val canonicalKey = udf(canonicalFn)
    val fileActions = all
      .select(col("version"), col("add"), col("remove"),
        coalesce(col("add.path"), col("remove.path")).as("path"))
      .filter(col("path").isNotNull)
      .withColumn("pathKey", canonicalKey(col("path")))
      // dv-aware state key (see InMemoryLogReplay): a DV update removes
      // (path, oldDv) and adds (path, newDv) in one version — distinct
      // keys, so the window must not fold them into one
      .withColumn("dvKey", coalesce(
        when(col("add.deletionVector").isNotNull, concat_ws("@",
          col("add.deletionVector.storageType"),
          col("add.deletionVector.pathOrInlineDv"),
          col("add.deletionVector.offset").cast("string"))),
        when(col("remove.deletionVector").isNotNull, concat_ws("@",
          col("remove.deletionVector.storageType"),
          col("remove.deletionVector.pathOrInlineDv"),
          col("remove.deletionVector.offset").cast("string"))),
        lit("")))

    val newestFirst = Window.partitionBy(col("pathKey"), col("dvKey"))
      .orderBy(col("version").desc, col("remove").isNotNull.desc)
    fileActions
      .withColumn("rn", row_number().over(newestFirst))
      .filter(col("rn") === 1 && col("add").isNotNull)
      .select(col("add.*"))
      .withColumn("dataChange", lit(false))
      .as[AddFile]
  }

  /** Distributed active-file list for a snapshot's log segment. */
  def activeFiles(snapshot: Snapshot): Dataset[AddFile] =
    activeFiles(snapshot.spark, snapshot.logSegment)
}
