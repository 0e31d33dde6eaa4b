package graft.delta.read

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

import graft.delta.{AddFile, Snapshot}

/** A Catalyst [[FileIndex]] over one Delta snapshot.
  *
  * This is where the reference's scan-side optimizations become native
  * Spark behavior (SURVEY §4): the file list comes from the transaction
  * log, so
  *
  *  - partition pruning happens here in `listFiles` — Catalyst's
  *    PruneFileSourcePartitions pushes partition filters to us and we
  *    evaluate them per distinct partition tuple (S2/H3 semantics);
  *  - file-level data skipping from AddFile stats runs in the same pass;
  *  - file sizes come from AddFile metadata, so planning makes zero
  *    per-file filesystem RPCs (the reference fabricates block locations
  *    for the same reason, DeltaHelper.scala:170-186);
  *  - partition values are decoded from the log's string map, NOT from
  *    directory names — Delta semantics require log-supplied values
  *    (hive/DeltaInputFormat.scala:43-45).
  *
  * The file list is either a driver-side `Seq[AddFile]` (small logs, DML
  * rewrites over known files) or a `Dataset[AddFile]` from the
  * distributed log replay — then pruning itself runs as a Spark job via
  * [[FilePruning]] and only SURVIVING files are collected, so a scan of
  * a million-file table with a selective partition predicate never
  * materializes the full file list on the driver.
  *
  * Split sizing stays with Spark (`spark.sql.files.maxPartitionBytes`,
  * default 128MB — matching the reference's `parquet.block.size` choice).
  */
class DeltaFileIndex private (
    spark: SparkSession,
    dataPath: Path,
    metadata: graft.delta.Metadata,
    source: Either[Seq[graft.delta.AddFile], Dataset[AddFile]],
    knownSizeInBytes: Option[() => Long]) extends FileIndex {

  def this(spark: SparkSession, dataPath: Path, metadata: graft.delta.Metadata,
           addFiles: Seq[graft.delta.AddFile]) =
    this(spark, dataPath, metadata, Left(addFiles), None)

  def this(spark: SparkSession, snapshot: Snapshot) =
    this(spark, snapshot.deltaLog.dataPath, snapshot.metadata,
      if (snapshot.distributedState) Right(snapshot.allFilesDistributed)
      else Left(snapshot.allFiles),
      Some(() => snapshot.sizeInBytes))

  override def rootPaths: Seq[Path] = Seq(dataPath)

  override def partitionSchema: StructType = metadata.partitionSchema

  private def absolutePath(child: String): Path =
    PartitionUtils.absolutePath(dataPath, child)

  /** Prune to the files any of whose rows can match; distributed source →
    * the pruning runs as a Spark job and collects survivors only. Data
    * filters on generated-column SOURCES first derive extra partition
    * conjuncts ([[GeneratedPartitionFilters]]) so the day-partitioned-by-
    * timestamp table prunes on a `ts` predicate too. */
  private def prunedFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[graft.delta.AddFile] = {
    val allPartFilters = partitionFilters ++
      GeneratedPartitionFilters.derive(metadata, dataFilters, spark)
    source match {
      case Left(files) =>
        val partitionPruned = PartitionUtils.filterFileList(
          partitionSchema, files, allPartFilters)
        DataSkipping.filterFiles(partitionPruned, dataFilters, metadata.dataSchema)
      case Right(ds) =>
        FilePruning.prune(ds, partitionSchema, allPartFilters, dataFilters,
          metadata.dataSchema).collect().toSeq
    }
  }

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val files = prunedFiles(partitionFilters, dataFilters)
    if (partitionSchema.isEmpty) {
      Seq(PartitionDirectory(org.apache.spark.sql.catalyst.InternalRow.empty,
        files.map(toFileStatus).toArray))
    } else {
      files.groupBy(_.partitionValues).toSeq.map { case (values, group) =>
        PartitionDirectory(
          PartitionUtils.partitionRow(partitionSchema, values),
          group.map(toFileStatus).toArray)
      }
    }
  }

  private def toFileStatus(add: graft.delta.AddFile): FileStatus =
    new FileStatus(add.size, false, 1, 128L * 1024 * 1024,
      add.modificationTime, absolutePath(add.path))

  override def inputFiles: Array[String] = source match {
    case Left(files) => files.map(f => absolutePath(f.path).toString).toArray
    case Right(ds) =>
      import org.apache.spark.sql.functions.col
      val dp = dataPath.toString
      ds.select(col("path")).collect()
        .map(r => PartitionUtils.absoluteFileName(new Path(dp), r.getString(0)))
  }

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = knownSizeInBytes.map(_.apply()).getOrElse(
    source match {
      case Left(files) => math.max(files.map(_.size).sum, 1L)
      case Right(_) => Long.MaxValue // unknown: never broadcast blindly
    })
}
