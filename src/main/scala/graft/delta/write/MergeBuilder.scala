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

  /** Conjuncts of the merge condition that constrain the TARGET alone:
    * every attribute reference is either explicitly `t.`-qualified or an
    * unqualified name that exists only in the target schema. These are
    * sound pruning predicates — the full condition implies each of them
    * — rewritten with the alias stripped so they bind against a bare
    * target scan. Resolved `AttributeReference`s (a caller passing
    * `sourceDf("col")`) are skipped: their side cannot be identified
    * syntactically, and skipping only costs pruning, never correctness. */
  private def targetOnlyPredicate(
      schema: org.apache.spark.sql.types.StructType): Option[Column] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{And => CatalystAnd, AttributeReference, Expression}
    def lower(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    val targetCols = schema.fieldNames.map(lower).toSet
    val sourceCols = source.columns.map(lower).toSet
    def targetOnly(e: Expression): Boolean = {
      var ok = true
      e.foreach {
        case a: UnresolvedAttribute => a.nameParts match {
          case Seq(q, n) if lower(q) == "t" && targetCols.contains(lower(n)) => ()
          case Seq(n) if targetCols.contains(lower(n)) &&
            !sourceCols.contains(lower(n)) => ()
          case _ => ok = false
        }
        case _: AttributeReference => ok = false
        // subquery conjuncts reference plans foreach doesn't traverse —
        // never treat them as prunable
        case _: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] => ok = false
        case _ => ()
      }
      ok
    }
    def strip(e: Expression): Expression = e.transform {
      case a: UnresolvedAttribute if a.nameParts.size == 2 &&
        lower(a.nameParts.head) == "t" => UnresolvedAttribute(a.nameParts.tail)
    }
    // the Column-API tree spells AND as UnresolvedFunction("and", ...) —
    // split that form as well as an already-catalyst And
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.map(lower) == Seq("and") && !f.isDistinct &&
            f.arguments.size == 2 =>
        f.arguments.flatMap(conjuncts)
      case CatalystAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val kept = conjuncts(
      org.apache.spark.sql.graft.Shims.catalystExpression(condition))
      .filter(targetOnly(_))
    if (kept.isEmpty) None
    else Some(org.apache.spark.sql.graft.Shims.column(
      kept.map(strip).reduce(CatalystAnd)))
  }

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

    // Bound the TARGET read by the merge condition's target-only
    // conjuncts (ref: DeltaScan.java:33-67 pushed-predicate contract).
    // A per-partition upsert must not scan a 100 TB table: partition
    // conjuncts narrow BOTH the scan and the transaction's read set
    // (concurrent appends to untouched partitions no longer conflict);
    // stats conjuncts additionally skip files by min/max. Rows outside
    // the candidate files cannot satisfy the merge condition (the
    // condition IMPLIES its own conjuncts), so the candidate scan is
    // also sufficient for the not-matched insert anti-join.
    val targetPred = targetOnlyPredicate(schema)
    val (metaC, dataC) = targetPred match {
      case Some(p) =>
        val resolved = read.PartitionUtils.resolveFilter(spark, schema, p)
        read.PartitionUtils.splitMetadataAndDataPredicates(
          resolved, metadata.partitionColumns)
      case None => (Nil, Nil)
    }
    val candidateFiles: Option[Seq[AddFile]] =
      if (metaC.nonEmpty) {
        // narrow read tracking + partition pruning; stats skip survivors
        val matched = txn.markFilesAsRead(targetPred.get)
        val keep = read.FilePruning.keepFile(
          metadata.partitionSchema, Nil, dataC, metadata.dataSchema)
        Some(matched.filter(keep))
      } else if (dataC.nonEmpty) {
        // no partition conjunct: conflict tracking stays whole-table
        // (a concurrent append could add matching rows anywhere), but
        // stats still bound the SCAN — pruning runs where the file list
        // lives and only survivors reach the driver
        txn.readWholeTable()
        val survivors =
          if (snapshot.distributedState)
            read.FilePruning.prune(snapshot.allFilesDistributed,
              metadata.partitionSchema, Nil, dataC, metadata.dataSchema)
              .collect().toSeq
          else snapshot.allFiles.filter(read.FilePruning.keepFile(
            metadata.partitionSchema, Nil, dataC, metadata.dataSchema))
        Some(survivors)
      } else {
        txn.readWholeTable() // merge reads target rows by data condition
        None
      }
    def scanFiles(files: Seq[AddFile]): DataFrame = {
      val index = new read.DeltaFileIndex(spark, deltaLog.dataPath, metadata, files)
      val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
        location = index,
        partitionSchema = metadata.partitionSchema,
        dataSchema = metadata.dataSchema,
        bucketSpec = None,
        fileFormat = new read.GuardedParquetFileFormat(metadata.columnMapping),
        options = Map.empty)(spark)
      spark.baseRelationToDataFrame(relation)
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    }
    val target = candidateFiles.map(scanFiles).getOrElse(snapshot.toDF).alias("t")
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
    val matchedFiles: Seq[AddFile] = candidateFiles match {
      case Some(cands) =>
        // the touched set is a subset of the (already driver-resident)
        // candidate files — no second pass over the state
        cands.filter(f => matchedFileNames.contains(
          read.PartitionUtils.inputFileName(deltaLog.dataPath, f.path)))
      case None if snapshot.distributedState =>
        val names = matchedFileNames
        val dataPathStr = deltaLog.dataPath.toString
        snapshot.allFilesDistributed.filter { f =>
          names.contains(read.PartitionUtils.inputFileName(
            new org.apache.hadoop.fs.Path(dataPathStr), f.path))
        }.collect().toSeq
      case None =>
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
        val rows = scanFiles(matchedFiles).alias("t")
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
              val post = GeneratedColumns.recompute(
                joined.filter(col("__match").isNotNull)
                  .select(schema.fieldNames.map { name =>
                    set.get(name).map(_.cast(schema(name).dataType).as(name))
                      .getOrElse(col(s"t.$name").as(name))
                  }.toIndexedSeq: _*),
                metadata, set.keySet)
              changeFrames :+=
                matchedRows.withColumn(CdcWriter.ChangeTypeCol, lit("update_preimage"))
                  .unionByName(post.withColumn(CdcWriter.ChangeTypeCol,
                    lit("update_postimage")))
            }
            // generated columns re-derive from their (possibly just-SET)
            // sources — without this, SET on a generation source would
            // trip the write-time equality guard and abort the MERGE
            GeneratedColumns.recompute(
              joined.select(schema.fieldNames.map { name =>
                set.get(name) match {
                  case Some(value) =>
                    when(col("__match").isNotNull, value.cast(schema(name).dataType))
                      .otherwise(col(s"t.$name")).as(name)
                  case None => col(s"t.$name").as(name)
                }
              }.toIndexedSeq: _*),
              metadata, set.keySet)
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
