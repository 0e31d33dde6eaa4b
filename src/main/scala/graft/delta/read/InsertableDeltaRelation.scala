package graft.delta.read

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.sources.InsertableRelation

import graft.delta.Snapshot

/** The relation `format("graft-delta")` serves to SQL: reads plan exactly
  * like a [[HadoopFsRelation]] (FileSourceStrategy, vectorized parquet,
  * pushdown through the [[DeltaFileIndex]]), while `INSERT INTO` /
  * `INSERT OVERWRITE` route through [[InsertableRelation.insert]] into the
  * transactional write path. Without this, Spark's V1 fallback plans
  * inserts as a raw file write into the table directory — bypassing the
  * log entirely (invisible rows at best, clobbered table dirs on
  * overwrite).
  *
  * Reference parity: the Flink connector's SQL INSERT surface
  * (`DeltaDynamicTableSink`, SURVEY §2.4 F9) re-expressed on Spark's V1
  * source API.
  */
class InsertableDeltaRelation(
    index: DeltaFileIndex,
    snapshot: Snapshot,
    val tablePath: String,
    spark: SparkSession)
  extends HadoopFsRelation(
    location = index,
    partitionSchema = snapshot.metadata.partitionSchema,
    dataSchema = snapshot.metadata.dataSchema,
    bucketSpec = None,
    fileFormat = new GuardedParquetFileFormat(snapshot.metadata.columnMapping, snapshot.metadata.fieldIdMapping),
    options = Map.empty)(spark)
  with InsertableRelation {

  /** The DECLARED column order (metadata schema). HadoopFsRelation's own
    * output reorders partition columns last — positional SQL inserts
    * must align against this, not that. */
  private[graft] def tableSchema: org.apache.spark.sql.types.StructType =
    snapshot.metadata.schema

  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    graft.delta.write.DeltaWriter.write(data, tablePath,
      if (overwrite) SaveMode.Overwrite else SaveMode.Append,
      partitionBy =
        if (overwrite) snapshot.metadata.partitionColumns else Nil)
  }
}
