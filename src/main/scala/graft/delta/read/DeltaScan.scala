package graft.delta.read

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation

import graft.delta.{AddFile, Snapshot}

/** Filtered file scan with the reference's pushed/residual contract
  * (SURVEY §2.3 S1/S2; ref DeltaScan.java:33-67,
  * FilteredDeltaScanImpl.scala:39-81).
  *
  * `pushedPredicate` (partition-only conjuncts) prunes the file list;
  * `residualPredicate` must be re-applied to the data by the caller —
  * when reading through [[DeltaScanBuilder.buildDF]], Spark re-applies the
  * full filter anyway, so the contract holds by construction.
  */
class DeltaScan(snapshot: Snapshot, filter: Option[Expression]) {

  val (pushedPredicates, residualPredicates): (Seq[Expression], Seq[Expression]) =
    filter match {
      case None => (Nil, Nil)
      case Some(f) => PartitionUtils.splitMetadataAndDataPredicates(
        f, snapshot.metadata.partitionColumns)
    }

  def inputPredicate: Option[Expression] = filter
  def pushedPredicate: Option[Expression] = pushedPredicates.reduceOption(And)
  def residualPredicate: Option[Expression] = residualPredicates.reduceOption(And)

  /** The active files surviving partition pruning. In distributed-state
    * mode the pruning runs as a Spark job and only survivors are
    * collected (never the full file list). */
  def getFiles: Seq[AddFile] =
    if (snapshot.distributedState) {
      // dataFilters = Nil: getFiles' contract is partition pruning only
      // (the caller re-applies the residual), same as the driver path
      FilePruning.prune(snapshot.allFilesDistributed,
        snapshot.metadata.partitionSchema, pushedPredicates,
        Nil, snapshot.metadata.dataSchema).collect().toSeq
    } else {
      PartitionUtils.filterFileList(
        snapshot.metadata.partitionSchema, snapshot.allFiles, pushedPredicates)
    }
}

/** Assembles the snapshot's DataFrame through a [[DeltaFileIndex]]-backed
  * HadoopFsRelation: Spark's vectorized parquet reader, whole-stage
  * codegen, filter pushdown (`PushedFilters` in explain) and partition
  * pruning all apply natively (S4 via Spark instead of row-at-a-time
  * parquet4s). */
class DeltaScanBuilder(snapshot: Snapshot) {

  def buildDF(filter: Option[Column]): DataFrame = {
    snapshot.assertReadable()
    val spark = snapshot.spark
    val index = new DeltaFileIndex(spark, snapshot)
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = snapshot.metadata.partitionSchema,
      dataSchema = snapshot.metadata.dataSchema,
      bucketSpec = None,
      fileFormat = new graft.delta.read.GuardedParquetFileFormat(snapshot.metadata.columnMapping, snapshot.metadata.fieldIdMapping),
      options = Map.empty)(spark)
    val df = spark.baseRelationToDataFrame(relation)
    // present columns in the table-schema order (partition columns are
    // appended last by HadoopFsRelation)
    val ordered = snapshot.metadata.schema.fieldNames.toSeq
    val projected =
      if (ordered.nonEmpty) df.select(ordered.map(org.apache.spark.sql.functions.col): _*)
      else df
    filter.map(projected.filter).getOrElse(projected)
  }
}
