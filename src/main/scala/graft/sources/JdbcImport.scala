package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.delta.DeltaTable

/** Parallel JDBC → Delta import (SURVEY §2.3 S6; ref
  * sql-delta-import/src/main/scala/JDBCImport.scala:10-88 and
  * ImportRunner.scala:1-70).
  *
  * Same shape as the reference: probe MIN/MAX of the numeric `splitBy`
  * column with one bounds query (ref :11-14), then hand Spark's JDBC
  * source the bounds and chunk count so executors read `chunks` ranged
  * partitions in parallel (ref readJDBCSourceInParallel :39-57 — Spark's
  * `read.jdbc(url, table, column, lower, upper, numPartitions)` issues
  * exactly those ranged predicates), apply caller transforms, repartition
  * to the output file count, and append to a Delta table transactionally.
  */
object JdbcImport {

  case class ImportConfig(
      url: String,
      source: String,          // "schema.table" or a subquery alias
      destination: String,     // Delta table path
      splitBy: String,         // numeric split column
      chunks: Int = 10,
      partitionBy: Seq[String] = Nil,
      outputFiles: Int = 0,    // 0 → leave as the chunk partitioning
      properties: java.util.Properties = new java.util.Properties)

  /** One import run: bounds probe → ranged parallel read → transform →
    * Delta append. Returns the committed version. */
  def run(spark: SparkSession, config: ImportConfig,
          transform: DataFrame => DataFrame = identity): Long = {
    val bounds = spark.read.jdbc(config.url,
      s"(SELECT MIN(${config.splitBy}) AS lo, MAX(${config.splitBy}) AS hi " +
        s"FROM ${config.source}) bounds",
      config.properties).collect().head
    if (bounds.isNullAt(0)) {
      // empty source: nothing to import, but the destination must exist
      val empty = spark.read.jdbc(config.url, config.source, config.properties)
        .limit(0)
      return DeltaTable.write(transform(empty), config.destination,
        SaveMode.Append, partitionBy = config.partitionBy)
    }
    val (lo, hi) = (toLong(bounds.get(0)), toLong(bounds.get(1)))
    val df = spark.read.jdbc(config.url, config.source, config.splitBy,
      lo, hi, config.chunks, config.properties)
    val transformed = transform(df)
    val sized =
      if (config.outputFiles > 0) transformed.repartition(config.outputFiles)
      else transformed
    DeltaTable.write(sized, config.destination, SaveMode.Append,
      partitionBy = config.partitionBy)
  }

  private def toLong(v: Any): Long = v match {
    case n: Number => n.longValue()
    case other => other.toString.toLong
  }
}
