package graft.delta

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** User-facing handle for a Delta table — the Spark-native equivalent of
  * the reference's `DeltaLog` + `Snapshot` + `DeltaScan` public surface
  * (SURVEY §1.1), plus the write path its connectors provide.
  *
  * {{{
  * DeltaTable.write(df, "/data/t", partitionBy = Seq("day"))
  * val t = DeltaTable.forPath(spark, "/data/t")
  * t.toDF.filter($"day" === "2026-01-01")        // partition-pruned scan
  * t.asOfVersion(0)                               // time travel (M9)
  * t.history()                                    // DESCRIBE HISTORY (M12)
  * }}}
  */
class DeltaTable private (val spark: SparkSession, val deltaLog: DeltaLog) {

  /** Latest-version DataFrame; filters/projections push down natively. */
  def toDF: DataFrame = deltaLog.update().toDF

  /** Scan with the reference's pushed/residual reporting (S2). */
  def scan(filter: Column): read.DeltaScan = {
    val snap = deltaLog.update()
    new read.DeltaScan(snap, Some(read.PartitionUtils.resolveFilter(
      spark, snap.metadata.schema, filter)))
  }

  /** Time travel by version (M9). */
  def asOfVersion(version: Long): DataFrame =
    deltaLog.getSnapshotForVersionAsOf(version).toDF

  /** Time travel by timestamp (M10). */
  def asOfTimestamp(tsMillis: Long): DataFrame =
    deltaLog.getSnapshotForTimestampAsOf(tsMillis).toDF

  /** Commit history, newest first (M12). */
  def history(): DataFrame = {
    import spark.implicits._
    spark.createDataset(deltaLog.history().map { ci =>
      (ci.version.getOrElse(-1L), ci.timestamp.getOrElse(0L),
        ci.operation.getOrElse(""), ci.isBlindAppend.getOrElse(false),
        ci.isolationLevel.getOrElse(""), ci.engineInfo.getOrElse(""),
        ci.operationMetrics.getOrElse(Map.empty))
    }).toDF("version", "timestamp", "operation", "isBlindAppend",
      "isolationLevel", "engineInfo", "operationMetrics")
  }

  def version: Long = deltaLog.update().version

  /** Delete rows matching a partition predicate without rewriting data
    * (metadata-only delete); predicates touching data columns are
    * rejected — rewrite-deletes arrive with the DML layer. */
  def deleteWhere(partitionFilter: Column): Long = {
    val txn = deltaLog.startTransaction()
    val resolved = read.PartitionUtils.resolveFilter(
      spark, txn.snapshot.metadata.schema, partitionFilter)
    val residual = new read.DeltaScan(txn.snapshot, Some(resolved)).residualPredicate
    require(residual.isEmpty,
      s"deleteWhere only supports partition-column predicates; residual: $residual")
    val matched = txn.markFilesAsRead(partitionFilter)
    txn.commit(matched.map(_.remove(deltaLog.clock())), DeltaOperations.Delete,
      operationMetrics = Map(
        "numRemovedFiles" -> matched.size.toString,
        "numRemovedBytes" -> matched.map(_.size).sum.toString))
  }
}

object DeltaTable {
  def forPath(spark: SparkSession, path: String): DeltaTable = {
    val log = DeltaLog.forTable(spark, path)
    require(log.tableExists, s"$path is not a Delta table")
    new DeltaTable(spark, log)
  }

  def isDeltaTable(spark: SparkSession, path: String): Boolean =
    DeltaLog.forTable(spark, path).tableExists

  /** Batch write (append / overwrite / create). */
  def write(df: DataFrame, path: String,
            mode: SaveMode = SaveMode.Append,
            partitionBy: Seq[String] = Nil,
            configuration: Map[String, String] = Map.empty): Long =
    graft.delta.write.DeltaWriter.write(df, path, mode, partitionBy, configuration)
}
