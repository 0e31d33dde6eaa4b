package graft.delta.write

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.delta._

/** MERGE INTO (upsert) as one transactional rewrite.
  *
  * {{{
  * table.merge(source, col("t.id") === col("s.id"))   // aliases t / s
  *   .whenMatchedUpdate(Map("price" -> col("s.price")))
  *   .whenNotMatchedInsertAll()
  *   .execute()
  * }}}
  *
  * Execution (scale notes inline):
  *  1. the TARGET side joins as `t`, the source as `s`; ONE job finds the
  *     files that can contain a match — an inner join carrying nothing but
  *     (file name, row id), aggregated per file so the multi-match guard
  *     (a target row with >1 source match is an error, like Delta) is
  *     answered by the same shuffle;
  *  2. matched files are re-read and LEFT-joined against the source once:
  *     matched rows take the UPDATE set (or drop, for DELETE), unmatched
  *     rows carry unchanged;
  *  3. NOT-MATCHED source rows (left-anti against the WHOLE target, not
  *     just matched files) insert, schema-aligned by name;
  *  4. one commit: removes(matched files) + adds(rewrite ∪ inserts),
  *     operation MERGE, Serializable isolation.
  */
final class MergeBuilder private[delta] (
    table: DeltaTable,
    source: DataFrame,
    condition: Column) {

  private var updateSet: Option[Map[String, Column]] = None
  private var matchedDelete = false
  private var insertAll = false
  private var idempotency: Option[(String, Long)] = None

  /** Make this MERGE idempotent under (appId, version): a re-execution
    * with a version at or below the recorded one is a no-op — the
    * foreachBatch-upsert pattern's exactly-once contract. */
  def withIdempotency(appId: String, version: Long): MergeBuilder = {
    idempotency = Some((appId, version)); this
  }

  def whenMatchedUpdate(set: Map[String, Column]): MergeBuilder = {
    require(!matchedDelete, "whenMatchedUpdate and whenMatchedDelete are exclusive")
    updateSet = Some(set); this
  }

  def whenMatchedDelete(): MergeBuilder = {
    require(updateSet.isEmpty, "whenMatchedUpdate and whenMatchedDelete are exclusive")
    matchedDelete = true; this
  }

  /** Insert unmatched source rows; source columns are matched to the
    * target schema by name (missing target columns become null). */
  def whenNotMatchedInsertAll(): MergeBuilder = { insertAll = true; this }

  def execute(): Long = {
    require(updateSet.isDefined || matchedDelete || insertAll,
      "MERGE needs at least one WHEN clause")
    val spark = table.spark
    val deltaLog = table.deltaLog
    val txn = deltaLog.startTransaction()
    val snapshot = txn.snapshot
    idempotency.foreach { case (appId, version) =>
      if (txn.txnVersion(appId) >= version) return snapshot.version
    }
    val metadata = snapshot.metadata
    val schema = metadata.schema
    updateSet.foreach(_.keys.foreach { c =>
      require(schema.fieldNames.contains(c), s"Unknown column $c in SET")
      require(!metadata.partitionColumns.contains(c),
        s"Updating partition column $c is not supported")
    })

    txn.readWholeTable() // merge reads target rows by data condition
    val target = snapshot.toDF.alias("t")
    val src = source.alias("s")

    // 1. ONE touched-file job: inner join carrying only (file, row-id),
    //    aggregated so the multi-match guard rides along — no second pass.
    //    The collect is file-count bounded (same order as the commit's
    //    RemoveFile list, which is driver-side by construction).
    val needGuard = updateSet.isDefined || matchedDelete
    val touched = target
      .withColumn("__file", input_file_name())
      .withColumn("__row", monotonically_increasing_id())
      .join(src, condition)
      .groupBy(col("__file"), col("__row")).agg(count(lit(1)).as("__n"))
      .groupBy(col("__file")).agg(max(col("__n")).as("__maxn"))
      .collect()
    if (needGuard && touched.exists(_.getAs[Long]("__maxn") > 1)) {
      throw new IllegalStateException(
        "MERGE: target row(s) matched by more than one source row " +
          "(result would be nondeterministic)")
    }
    // input_file_name() spells paths as SparkPath/URI strings; build the
    // AddFile side the same way or encoded paths silently never match.
    val matchedFileNames = touched.map(_.getAs[String]("__file")).toSet
    // Resolve the (file-count-bounded) touched-name set against the file
    // list WHERE IT LIVES: in distributed-state mode that's a Dataset
    // filter collecting only the touched files — a 3-file merge on a
    // million-file table never materializes the full state on the driver.
    val matchedFiles: Seq[AddFile] =
      if (snapshot.distributedState) {
        val names = matchedFileNames
        val dataPathStr = deltaLog.dataPath.toString
        snapshot.allFilesDistributed.filter { f =>
          names.contains(read.PartitionUtils.inputFileName(
            new org.apache.hadoop.fs.Path(dataPathStr), f.path))
        }.collect().toSeq
      } else {
        snapshot.allFiles.filter { f =>
          matchedFileNames.contains(
            read.PartitionUtils.inputFileName(deltaLog.dataPath, f.path))
        }
      }

    val cdcEnabled = CdcWriter.enabled(metadata)
    var changeFrames = Vector.empty[DataFrame]
    var cached: Option[DataFrame] = None

    // 2. rewrite matched files with the source joined in
    val rewritten: Option[DataFrame] =
      if (matchedFiles.isEmpty || (updateSet.isEmpty && !matchedDelete)) None
      else {
        val index = new read.DeltaFileIndex(spark, deltaLog.dataPath, metadata, matchedFiles)
        val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
          location = index,
          partitionSchema = metadata.partitionSchema,
          dataSchema = metadata.dataSchema,
          bucketSpec = None,
          fileFormat = new read.GuardedParquetFileFormat(metadata.columnMapping),
          options = Map.empty)(spark)
        val rows = spark.baseRelationToDataFrame(relation)
          .select(schema.fieldNames.map(col).toIndexedSeq: _*)
          .alias("t")
        // multi-match already rejected by the touched-file job above, so
        // the rewrite is a single left join — no second guard pass.
        // With CDF on, the join feeds BOTH the rewrite and the pre/post
        // change images: persist it for the duration of the writes so the
        // join executes once, not once per consumer.
        var joined = rows.join(
          src.withColumn("__match", lit(1)), condition, "left")
        if (cdcEnabled) {
          joined = joined.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          cached = Some(joined)
        }
        val matchedRows = joined.filter(col("__match").isNotNull)
          .select(schema.fieldNames.map(n => col(s"t.$n").as(n)).toIndexedSeq: _*)
        // project straight to the target schema (never withColumn — the
        // joined frame carries ambiguous names from both sides)
        val out = updateSet match {
          case Some(set) =>
            if (cdcEnabled) {
              val post = joined.filter(col("__match").isNotNull)
                .select(schema.fieldNames.map { name =>
                  set.get(name).map(_.cast(schema(name).dataType).as(name))
                    .getOrElse(col(s"t.$name").as(name))
                }.toIndexedSeq: _*)
              changeFrames :+=
                matchedRows.withColumn(CdcWriter.ChangeTypeCol, lit("update_preimage"))
                  .unionByName(post.withColumn(CdcWriter.ChangeTypeCol,
                    lit("update_postimage")))
            }
            joined.select(schema.fieldNames.map { name =>
              set.get(name) match {
                case Some(value) =>
                  when(col("__match").isNotNull, value.cast(schema(name).dataType))
                    .otherwise(col(s"t.$name")).as(name)
                case None => col(s"t.$name").as(name)
              }
            }.toIndexedSeq: _*)
          case None => // matchedDelete
            if (cdcEnabled) {
              changeFrames :+=
                matchedRows.withColumn(CdcWriter.ChangeTypeCol, lit("delete"))
            }
            joined.filter(col("__match").isNull)
              .select(schema.fieldNames.map(n => col(s"t.$n").as(n)).toIndexedSeq: _*)
        }
        Some(out)
      }

    // 3. inserts: source rows matching NO target row, aligned by name
    val inserts: Option[DataFrame] =
      if (!insertAll) None
      else {
        // generated columns the source does not carry COMPUTE (not
        // null-fill) — a date-partitioned target must place merge-inserts
        // in the right partition, same as appends
        val unmatched = GeneratedColumns.materialize(
          src.join(target, condition, "left_anti"), metadata)
        val aligned = unmatched.select(schema.fields.map { f =>
          if (unmatched.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }.toIndexedSeq: _*)
        Some(aligned)
      }

    val toWrite = (rewritten, inserts) match {
      case (Some(r), Some(i)) => Some(r.unionByName(i))
      case (r, i) => r.orElse(i)
    }
    // the persisted CDF join must be released on EVERY exit — a failing
    // write job would otherwise leak the cache for the session
    try {
      val adds = toWrite.map(df =>
        DeltaWriter.writeFiles(Invariants.enforce(df, metadata), deltaLog,
          metadata.partitionColumns, metadata.columnMapping, Some(metadata)))
        .getOrElse(Nil)
      val removes =
        if (rewritten.isDefined) matchedFiles.map(_.remove(deltaLog.clock()))
        else Nil

      if (adds.isEmpty && removes.isEmpty) return snapshot.version
      if (cdcEnabled) {
        inserts.foreach(i => changeFrames :+=
          i.withColumn(CdcWriter.ChangeTypeCol, lit("insert")))
      }
      val cdc: Seq[Action] = changeFrames.reduceOption(_.unionByName(_))
        .map(CdcWriter.writeChangeFiles(_, deltaLog, metadata.columnMapping))
        .getOrElse(Nil)
      val txnAction: Seq[Action] = idempotency.toSeq.map { case (appId, v) =>
        SetTransaction(appId, v, Some(deltaLog.clock()))
      }
      txn.commit(txnAction ++ cdc ++ adds ++ removes, DeltaOperations.Merge,
        operationMetrics = Map(
          "numTargetFilesRemoved" -> removes.size.toString,
          "numTargetFilesAdded" -> adds.size.toString))
    } finally cached.foreach(_.unpersist(blocking = false))
  }
}
