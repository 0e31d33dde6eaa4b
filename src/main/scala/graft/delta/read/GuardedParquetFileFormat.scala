package graft.delta.read

import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** ParquetFileFormat whose WRITE path is disabled.
  *
  * Every relation this engine serves reads through the normal vectorized
  * parquet reader (inherited untouched), but a write planned THROUGH the
  * relation — Spark's V1 `InsertIntoHadoopFsRelationCommand` fallback —
  * would put files straight into the table directory without a log
  * commit, and `INSERT OVERWRITE` would delete the directory contents
  * including `_delta_log`. `prepareWrite` is the first call on that path,
  * so throwing here turns silent corruption into a clear error. The
  * supported route is [[graft.GraftExtensions]], whose analyzer rule
  * re-plans such inserts through the transactional
  * [[InsertableDeltaRelation.insert]].
  */
class GuardedParquetFileFormat extends ParquetFileFormat {
  override def prepareWrite(
      sparkSession: SparkSession,
      job: Job,
      options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory = {
    throw new UnsupportedOperationException(
      "Direct file writes into a Delta table are not allowed (they would " +
        "bypass the transaction log). For SQL INSERT support, build the " +
        "session with graft.GraftExtensions " +
        "(spark.sql.extensions=graft.GraftExtensions) or use " +
        "DeltaTable.write / df.write.format(\"graft-delta\").")
  }
}
