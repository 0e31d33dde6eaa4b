package graft.delta.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.streaming.OutputMode

import graft.delta._
import graft.delta.write.{DeltaWriter, Invariants}

/** Exactly-once streaming sink (SURVEY §2.4 F7/F8: the Flink two-phase
  * writer/global-committer collapsed into one transactional `addBatch`).
  *
  * Idempotence is the reference's SetTransaction scheme
  * (DeltaGlobalCommitter.java:554-568): each committed batch records
  * `SetTransaction(appId, batchId)`; a replayed batch (failure/restart
  * re-execution) sees `txnVersion(appId) >= batchId` and skips — so the
  * log sees each micro-batch exactly once even though Spark may run it
  * twice. appId = the streaming query id (stable across restarts from
  * the same checkpoint), overridable with option `txnAppId`.
  */
class DeltaSink(
    sqlContext: SQLContext,
    path: String,
    partitionColumns: Seq[String],
    outputMode: OutputMode,
    options: Map[String, String]) extends Sink {

  /** Identity when neither txnAppId nor the engine's queryId exists (a
    * custom harness driving addBatch directly): a fresh per-SINK id.
    * Sharing the table PATH here would make two distinct queries skip
    * each other's batches as "replays" — silent data loss; a per-sink
    * id degrades only to at-least-once across process restarts for such
    * harnesses, which is the safe direction. */
  private lazy val fallbackAppId =
    s"graft-sink-${java.util.UUID.randomUUID()}"

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = sqlContext.sparkSession
    val deltaLog = DeltaLog.forTable(spark, path)
    val appId = options.getOrElse("txnAppId",
      Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
        .getOrElse(fallbackAppId))

    deltaLog.deltaLogLock.synchronized {
      val txn = deltaLog.startTransaction()
      if (txn.txnVersion(appId) >= batchId) {
        return // this batch already committed — exactly-once replay skip
      }
      val batch0 = Shims.materializeBatch(data)
      val (batch, assignedIdentity) =
        if (deltaLog.tableExists) {
          graft.delta.write.IdentityColumns.assign(
            graft.delta.write.GeneratedColumns
              .materialize(batch0, txn.snapshot.metadata),
            txn.snapshot.metadata)
        } else (batch0, Nil)
      if (!deltaLog.tableExists) {
        txn.updateMetadata(Metadata(
          schemaString = Some(DeltaWriter.relaxed(batch.schema).json),
          partitionColumns = partitionColumns))
      } else {
        // the same schema discipline as batch appends: a mismatched
        // batch (missing column, retyped column) must fail, and a
        // genuinely new column evolves the schema — writing through
        // writeFiles without this silently commits unreadable columns
        val existing = txn.snapshot.metadata.schema
        val merged = DeltaWriter.mergeSchemas(existing, batch.schema)
        if (merged.json != txn.snapshot.metadata.schemaString.getOrElse("")) {
          txn.updateMetadata(txn.snapshot.metadata.copy(
            schemaString = Some(merged.json)))
        }
      }
      val adds = DeltaWriter.writeFiles(Invariants.enforce(batch, txn.metadata),
        deltaLog, effectivePartitions(txn), txn.metadata.columnMapping,
        Some(txn.metadata))
      // identity marks advance with the batch's commit, same as appends
      if (assignedIdentity.nonEmpty) {
        val cur = txn.metadata
        val newSchema = org.apache.spark.sql.types.StructType(
          cur.schema.fields.map { f =>
            if (!assignedIdentity.contains(f.name)) f
            else graft.delta.write.IdentityColumns
              .specs(cur.schema).find(_.name == f.name)
              .flatMap(s => graft.delta.write.IdentityColumns
                .writtenWaterMark(spark, deltaLog, adds, s))
              .fold(f)(hwm => f.copy(metadata =
                new org.apache.spark.sql.types.MetadataBuilder()
                  .withMetadata(f.metadata)
                  .putLong(graft.delta.write.IdentityColumns.HighWaterMarkKey,
                    hwm).build()))
          })
        txn.amendMetadata(cur.copy(schemaString = Some(newSchema.json)))
      }
      val removes: Seq[Action] =
        if (outputMode == OutputMode.Complete()) {
          txn.readWholeTable()
          txn.snapshot.allFiles.map(_.remove(deltaLog.clock()))
        } else Nil
      txn.commit(
        SetTransaction(appId, batchId, Some(deltaLog.clock())) +:
          (adds ++ removes),
        DeltaOperations.StreamingUpdate,
        operationParameters = Map(
          "outputMode" -> outputMode.toString,
          "queryId" -> appId,
          "epochId" -> batchId))
    }
  }

  private def effectivePartitions(
      t: graft.delta.txn.OptimisticTransaction): Seq[String] =
    if (t.readVersion >= 0) t.snapshot.metadata.partitionColumns
    else partitionColumns

  override def toString: String = s"GraftDeltaSink[$path]"
}
