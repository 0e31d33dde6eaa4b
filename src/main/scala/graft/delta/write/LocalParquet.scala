package graft.delta.write

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoder, ExpressionEncoder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport

/** Driver-side parquet writer for DRIVER-SMALL, already-materialized
  * action sets (checkpoint main files, small checkpoint parts, sidecars).
  *
  * Rationale (guide §1 profile, r16): a cadence checkpoint of a small
  * table writes a handful of KB-sized parquet files, but doing it through
  * `Dataset.write.parquet` costs a full Spark job each — task scheduling,
  * the output committer's temp-dir/rename protocol, and the checksummed
  * local FS's fork+exec chmod + .crc sidecars; measured 0.3-0.9 s per
  * checkpoint on an idle host, ~0 data. The rows are ALREADY on the
  * driver in these paths (the same driver-small precondition the
  * driver-local vacuum uses), so write them with parquet's own writer
  * through java.nio — same bytes a one-task Spark job would produce
  * (same WriteSupport, same schema, same codec), none of the scaffolding.
  *
  * Distributed-state paths never route here: callers guard on
  * `!snapshot.distributedState` and a row-count bound, so at scale the
  * Spark-job path runs unchanged. */
object LocalParquet {

  /** Rows a checkpoint artifact may be asked to hold driver-side; above
    * this the Spark-job path must run (mirrors DriverVacuumMaxFiles). */
  val MaxDriverRows = 10000

  /** Write `rows` as ONE parquet file at `path` (a local-scheme URI or
    * filesystem path), encoded exactly as `Dataset[T].write.parquet`
    * would encode them. Returns the number of rows written. */
  def write[T](spark: SparkSession, path: String, rows: Seq[T],
               enc: Encoder[T]): Long = {
    val schema = enc.schema
    // the session's hadoop conf carries every spark.sql.* key the parquet
    // WriteSupport and schema converter consult (newHadoopConf merges the
    // SQL conf in — the same conf FileFormatWriter hands the task-side
    // writer), so driver-written files cannot diverge from job-written ones
    val conf = spark.sessionState.newHadoopConf()
    ParquetWriteSupport.setSchema(schema, conf)
    // ParquetWriteSupport.init asserts these are PRESENT (raw conf.get);
    // newHadoopConf only carries explicitly-set session entries, so stamp
    // them from the resolved SQLConf exactly as ParquetUtils.prepareWrite
    // does for the task-side writer
    val sqlc = spark.sessionState.conf
    import org.apache.spark.sql.internal.SQLConf
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlc.getConf(SQLConf.PARQUET_WRITE_LEGACY_FORMAT).toString)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlc.getConf(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE).toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlc.getConf(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED).toString)
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sqlc.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sqlc.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlc.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    val codec = CompressionCodecName.fromConf(
      spark.sessionState.conf
        .getConfString("spark.sql.parquet.compression.codec", "snappy")
        .toUpperCase(java.util.Locale.ROOT))
    val nioPath = java.nio.file.Paths.get(
      if (path.startsWith("file:")) new java.net.URI(path).getPath else path)
    val parent = nioPath.getParent
    if (parent != null) java.nio.file.Files.createDirectories(parent)
    val builder = new RowBuilder(
      new org.apache.parquet.io.LocalOutputFile(nioPath))
      .withConf(conf)
      .withCompressionCodec(codec)
      .withWriteMode(org.apache.parquet.hadoop.ParquetFileWriter.Mode.OVERWRITE)
    val writer = builder.build()
    var n = 0L
    try {
      val toRow = ExpressionEncoder(enc.asInstanceOf[AgnosticEncoder[T]])
        .createSerializer()
      rows.foreach { r => writer.write(toRow(r)); n += 1 }
    } catch {
      case t: Throwable =>
        try writer.close() catch { case _: Throwable => () }
        java.nio.file.Files.deleteIfExists(nioPath)
        throw t
    }
    writer.close()
    n
  }

  private final class RowBuilder(out: org.apache.parquet.io.OutputFile)
    extends ParquetWriter.Builder[InternalRow, RowBuilder](out) {
    override def getWriteSupport(conf: Configuration) = new ParquetWriteSupport
    override def self(): RowBuilder = this
  }

  /** Bytes above which the driver-side read defers to a Spark job: a
    * KB-sized checkpoint artifact reads faster without a job, a 100 MB
    * one reads faster WITH 32 cores. */
  val MaxDriverReadBytes: Long = 16L * 1024 * 1024

  /** Driver-side read of small local parquet files as `T`, decoding with
    * the same ReadSupport/schema-clipping Spark's non-vectorized reader
    * uses (`enc.schema` plays the requested schema: missing columns null-
    * fill, extra columns prune at the parquet layer — the exact semantics
    * of `spark.read.schema(enc.schema).parquet(...)`). Caveat: the
    * plain-constructor ReadSupport performs no datetime rebase — callers
    * here read ACTION schemas (long/string/bool/struct/map only). */
  def read[T](spark: SparkSession, paths: Seq[String], enc: Encoder[T]): Vector[T] = {
    import org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport
    val schema = enc.schema
    val conf = spark.sessionState.newHadoopConf()
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, schema.json)
    val sqlc = spark.sessionState.conf
    import org.apache.spark.sql.internal.SQLConf
    conf.set(SQLConf.PARQUET_BINARY_AS_STRING.key,
      sqlc.getConf(SQLConf.PARQUET_BINARY_AS_STRING).toString)
    conf.set(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key,
      sqlc.getConf(SQLConf.PARQUET_INT96_AS_TIMESTAMP).toString)
    conf.set(SQLConf.CASE_SENSITIVE.key,
      sqlc.getConf(SQLConf.CASE_SENSITIVE).toString)
    conf.set(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      sqlc.getConf(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED).toString)
    conf.set(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      sqlc.getConf(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG).toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key,
      sqlc.getConf(SQLConf.PARQUET_FIELD_ID_READ_ENABLED).toString)
    val deser = ExpressionEncoder(enc.asInstanceOf[AgnosticEncoder[T]])
      .resolveAndBind().createDeserializer()
    val out = Vector.newBuilder[T]
    paths.foreach { p =>
      val nioPath = java.nio.file.Paths.get(
        if (p.startsWith("file:")) new java.net.URI(p).getPath else p)
      val reader = new RowReadBuilder(
        new org.apache.parquet.io.LocalInputFile(nioPath))
        .withConf(conf).build()
      try {
        var row = reader.read()
        while (row != null) {
          out += deser(row)
          row = reader.read()
        }
      } finally reader.close()
    }
    out.result()
  }

  private final class RowReadBuilder(in: org.apache.parquet.io.InputFile)
    extends org.apache.parquet.hadoop.ParquetReader.Builder[InternalRow](in) {
    override def getReadSupport()
      : org.apache.parquet.hadoop.api.ReadSupport[InternalRow] =
      new org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport
  }
}
