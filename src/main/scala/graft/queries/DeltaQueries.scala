package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.delta.DeltaTable

/** Queries that run THROUGH the Delta engine: each writes a Delta table
  * from the driver's parquet testdata, exercises an engine capability
  * (log replay, partition pruning, time travel, metadata delete, schema
  * evolution, checkpoints), reads the result back as a DataFrame and
  * aggregates it. The DuckDB oracle computes the same answer directly from
  * the source parquet — so a hash match proves the engine's write path,
  * log replay and scan semantics, not just Spark's relational operators.
  */
object DeltaQueries {
  import Tables.t

  private def tmp(prefix: String): String =
    ScratchDirs.register(Files.createTempDirectory(s"graft_$prefix").toString)

  /** Shared table for the staged DV-delete lifecycle, memoized per
    * (JVM, sf dir). `cleanV` is the version right after the DV-enabled
    * write, `shadedV` right after the two bitmap deletes; each stage
    * RESTOREs to its input version when a prior sample moved the table
    * past it (restore-to-current is a free no-op), so every sample of a
    * stage times the same work. */
  private case class DvStageState(path: String, cleanV: Long,
                                  shadedV: Long)
  private val dvStageMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DvStageState]()

  /** Stage 1: DV-enabled write of `orders` (always a fresh Overwrite —
    * this IS the timed work of delta_dv_delete_write). */
  private def dvStageWrite(s: SparkSession, dir: String): DvStageState = {
    // NOT ScratchDirs-registered: the staged dv_delete_* queries share
    // this table across samples (restore-to-version partitions the cost)
    val path = Option(dvStageMemo.get(dir)).map(_.path)
      .getOrElse(Files.createTempDirectory("graft_dvstage").toString)
    DeltaTable.write(t(s, dir, "orders"), path, SaveMode.Overwrite,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    val st = DvStageState(path,
      cleanV = DeltaTable.forPath(s, path).deltaLog.update().version,
      shadedV = -1L)
    dvStageMemo.put(dir, st)
    st
  }

  /** Stage 2: the two shading deletes over the clean table (restoring to
    * it first; builds stage 1 inline when run cold in isolation). */
  private def dvStageShade(s: SparkSession, dir: String): DvStageState = {
    import org.apache.spark.sql.functions.col
    val st0 = Option(dvStageMemo.get(dir)).getOrElse(dvStageWrite(s, dir))
    val table = DeltaTable.forPath(s, st0.path)
    if (table.deltaLog.update().version != st0.cleanV) {
      table.restore(st0.cleanV)
    }
    table.delete(col("o_totalprice") > 150000.0)
    table.delete(col("o_orderstatus") === "F" &&
      col("o_totalprice") < 50000.0)
    val st = st0.copy(
      shadedV = table.deltaLog.update().version)
    dvStageMemo.put(dir, st)
    st
  }

  /** Stage 3 input: the SHADED table (restored to it when a prior purge
    * sample compacted past it — the shaded files still exist on disk,
    * compact never vacuums; builds stages 1+2 inline when run cold). */
  private def dvStageShaded(s: SparkSession, dir: String): DvStageState =
    Option(dvStageMemo.get(dir)).filter(_.shadedV >= 0) match {
      case Some(st) =>
        val table = DeltaTable.forPath(s, st.path)
        if (table.deltaLog.update().version != st.shadedV) {
          table.restore(st.shadedV)
        }
        st
      case None => dvStageShade(s, dir)
    }

  /** Stable per-JVM warehouse per catalog name. Spark instantiates a
    * DSv2 catalog ONCE per session and caches it; pointing the conf at
    * a FRESH temp dir on a re-run (Bench samples every query at least
    * twice) leaves the cached catalog writing to the old warehouse
    * while path-based derefs read the new empty one — the
    * delta_sql_maintenance "No Metadata found" re-run failure. */
  private val warehouses =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def warehouse(catalog: String): String =
    warehouses.computeIfAbsent(catalog,
      c => Files.createTempDirectory(s"graft_wh_$c").toString)

  val defs: Seq[QueryDef] = Seq(

    // Write lineitem to a Delta table, read it back, aggregate (M1-M6, T2, S1/S4).
    QueryDef(
      "delta_write_read_agg",
      (s, dir) => {
        import s.implicits._
        val path = tmp("roundtrip")
        DeltaTable.write(t(s, dir, "lineitem"), path, SaveMode.Overwrite)
        DeltaTable.forPath(s, path).toDF
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"),
               sum($"l_quantity".cast(DecimalType(12, 2))).cast("double").as("sum_qty"))
      },
      Some("""
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY l_returnflag""")),

    // Partitioned Delta table + partition-pruned scan (S2, M3).
    QueryDef(
      "delta_partition_pruned_scan",
      (s, dir) => {
        import s.implicits._
        val path = tmp("pruned")
        DeltaTable.write(t(s, dir, "orders"), path, SaveMode.Overwrite,
          partitionBy = Seq("o_orderpriority"))
        DeltaTable.forPath(s, path).toDF
          .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 100000.0)
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"),
               sum($"o_totalprice".cast(DecimalType(12, 2))).cast("double").as("sum_price"))
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 100000.0
        GROUP BY o_orderstatus""")),

    // Three commits, then read version 1 (M9 time travel).
    QueryDef(
      "delta_time_travel",
      (s, dir) => {
        import s.implicits._
        val path = tmp("timetravel")
        val orders = t(s, dir, "orders")
        DeltaTable.write(orders.filter($"o_orderstatus" === "F"), path, SaveMode.Overwrite)
        DeltaTable.write(orders.filter($"o_orderstatus" === "O"), path)
        DeltaTable.write(orders.filter($"o_orderstatus" === "P"), path)
        DeltaTable.forPath(s, path).asOfVersion(1)
          .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders WHERE o_orderstatus IN ('F', 'O')
        GROUP BY o_orderstatus""")),

    // RESTORE to an earlier version: overwrite discards F+O for P, the
    // restore commit diffs the two snapshots and brings F+O back (new
    // commit on top — history keeps all versions). Runs through the SQL
    // statement so the parser surface is exercised too.
    QueryDef(
      "delta_restore",
      (s, dir) => {
        import s.implicits._
        val path = tmp("restore")
        val orders = t(s, dir, "orders")
        DeltaTable.write(orders.filter($"o_orderstatus" === "F"), path, SaveMode.Overwrite)
        DeltaTable.write(orders.filter($"o_orderstatus" === "O"), path)
        DeltaTable.write(orders.filter($"o_orderstatus" === "P"), path, SaveMode.Overwrite)
        s.sql(s"RESTORE TABLE '$path' TO VERSION AS OF 1").collect()
        val tbl = DeltaTable.forPath(s, path)
        val nRestoreOps = tbl.history()
          .filter($"operation" === "RESTORE").count()
        tbl.toDF
          .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
          .withColumn("n_restore_ops", lit(nRestoreOps))
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n, CAST(1 AS BIGINT) AS n_restore_ops
        FROM orders WHERE o_orderstatus IN ('F', 'O')
        GROUP BY o_orderstatus""")),

    // Pure-SQL time travel + history through the table-valued functions
    // (the F9 SELECT surface: VERSION AS OF ≡ graft_table(path, v),
    // DESCRIBE HISTORY ≡ graft_history(path)).
    QueryDef(
      "delta_sql_time_travel",
      (s, dir) => {
        import s.implicits._
        val path = tmp("sqltt")
        val orders = t(s, dir, "orders")
        DeltaTable.write(orders.filter($"o_orderstatus" === "F"), path, SaveMode.Overwrite)
        DeltaTable.write(orders.filter($"o_orderstatus" === "O"), path)
        DeltaTable.write(orders.filter($"o_orderstatus" === "P"), path)
        s.sql(s"""
          SELECT t.o_orderstatus, COUNT(*) AS n, MAX(h.n_commits) AS n_commits
          FROM graft_table('$path', 1) t
          CROSS JOIN (SELECT COUNT(*) AS n_commits
                      FROM graft_history('$path')) h
          GROUP BY t.o_orderstatus""")
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n, CAST(3 AS BIGINT) AS n_commits
        FROM orders WHERE o_orderstatus IN ('F', 'O')
        GROUP BY o_orderstatus""")),

    // Metadata-only partition delete (tombstones, M15 path).
    QueryDef(
      "delta_partition_delete",
      (s, dir) => {
        import s.implicits._
        val path = tmp("delete")
        DeltaTable.write(t(s, dir, "orders"), path, SaveMode.Overwrite,
          partitionBy = Seq("o_orderpriority"))
        val table = DeltaTable.forPath(s, path)
        table.deleteWhere($"o_orderpriority" === "5-LOW")
        table.toDF.groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders WHERE o_orderpriority <> '5-LOW'
        GROUP BY o_orderpriority""")),

    // Append-time schema evolution: new nullable column (T7).
    QueryDef(
      "delta_schema_evolution",
      (s, dir) => {
        import s.implicits._
        val path = tmp("evolve")
        val c = t(s, dir, "customer")
        DeltaTable.write(c.filter($"c_custkey" % 2 === 0), path, SaveMode.Overwrite)
        DeltaTable.write(
          c.filter($"c_custkey" % 2 === 1)
            .withColumn("vip", $"c_acctbal" > 5000.0),
          path)
        DeltaTable.forPath(s, path).toDF
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n"),
               count(when($"vip", 1)).as("n_vip"),
               count(when($"vip".isNull, 1)).as("n_pre_evolution"))
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n,
               COUNT(CASE WHEN c_custkey % 2 = 1 AND c_acctbal > 5000.0 THEN 1 END) AS n_vip,
               COUNT(CASE WHEN c_custkey % 2 = 0 THEN 1 END) AS n_pre_evolution
        FROM customer GROUP BY c_mktsegment""")),

    // Many commits across a checkpoint boundary; fresh log replays from
    // the checkpoint (M7/M8) — the count proves no file lost or duplicated.
    QueryDef(
      "delta_checkpoint_replay",
      (s, dir) => {
        import s.implicits._
        val path = tmp("checkpoint")
        val li = t(s, dir, "lineitem")
        DeltaTable.write(li.filter($"l_linenumber" === 1), path, SaveMode.Overwrite,
          configuration = Map("delta.checkpointInterval" -> "3"))
        (2 to 7).foreach { i =>
          DeltaTable.write(li.filter($"l_linenumber" === i), path)
        }
        graft.delta.DeltaLog.clearCache() // force replay from checkpoint
        DeltaTable.forPath(s, path).toDF
          .groupBy($"l_linenumber").agg(
            count(lit(1)).as("n"),
            sum($"l_orderkey").as("sum_orderkey"))
      },
      Some("""
        SELECT l_linenumber, COUNT(*) AS n, CAST(SUM(l_orderkey) AS BIGINT) AS sum_orderkey
        FROM lineitem WHERE l_linenumber BETWEEN 1 AND 7
        GROUP BY l_linenumber""")),

    // Minor LOG COMPACTION (PROTOCOL.md "Log Compaction Files"): the
    // post-commit cadence (graft.logCompaction.interval=2) writes
    // {1}.{2}. and {3}.{4}.compacted.json during the append loop; the
    // subsumed commit JSONs are then DELETED before the read, so the
    // aggregate can only be right if segment assembly covers the log
    // from the compacted ranges and replay folds them exactly.
    QueryDef(
      "delta_log_compaction",
      (s, dir) => {
        import s.implicits._
        val path = tmp("logcompact")
        val ord = t(s, dir, "orders")
        DeltaTable.write(ord.filter($"o_orderkey" % 5 === 0), path,
          SaveMode.Overwrite,
          configuration = Map("graft.logCompaction.interval" -> "2"))
        (1 to 4).foreach { i =>
          DeltaTable.write(ord.filter($"o_orderkey" % 5 === i), path)
        }
        val log = graft.delta.DeltaLog.forTable(s, path)
        val fs = log.logPath.getFileSystem(log.hadoopConf)
        Seq((1L, 2L), (3L, 4L)).foreach { case (a, b) =>
          require(fs.exists(graft.delta.FileNames.compactedFile(log.logPath, a, b)),
            s"cadence hook must have written $a.$b.compacted.json")
        }
        (1 to 4).foreach { v =>
          require(fs.delete(
            graft.delta.FileNames.deltaFile(log.logPath, v), false),
            s"original commit $v must exist to be deleted")
        }
        graft.delta.DeltaLog.clearCache() // force replay over compacted ranges
        DeltaTable.forPath(s, path).toDF
          .groupBy($"o_orderpriority").agg(
            count(lit(1)).as("n"),
            sum($"o_totalprice".cast(DecimalType(18, 2))).cast("double")
              .as("sum_price"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY o_orderpriority""")),

    // V2 checkpoint lifecycle with sidecar CARRY-OVER: two interval
    // checkpoints fire during the append loop; the `carried` column
    // proves the second re-referenced sidecars of the first, and the
    // subsumed commit JSONs are DELETED before the read so the aggregate
    // can only be right if replay through the carried checkpoint is.
    QueryDef(
      "delta_v2_checkpoint",
      (s, dir) => {
        import s.implicits._
        val path = tmp("v2cp")
        val li = t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_quantity")
        // 16 seed files over 8 buckets: the two single-file interval
        // appends can then never (p ~ 1e-9 over path-uuid hashing) touch
        // every occupied bucket, so `carried` is deterministic
        DeltaTable.write(li.filter($"l_orderkey" % 5 === 0).repartition(16),
          path,
          SaveMode.Overwrite,
          configuration = Map(
            "delta.checkpointPolicy" -> "v2",
            "delta.checkpointParts" -> "8",
            "delta.checkpointInterval" -> "2"))
        (1 to 4).foreach { i => // checkpoints fire at v2 and v4
          DeltaTable.write(li.filter($"l_orderkey" % 5 === i).coalesce(1),
            path)
        }
        val log = graft.delta.DeltaLog.forTable(s, path)
        val logDir = new java.io.File(log.logPath.toUri.getPath)
        val mains = logDir.listFiles()
          .filter(f => graft.delta.FileNames.isV2CheckpointFile(
            new org.apache.hadoop.fs.Path(f.getName)))
          .sortBy(_.getName)
        require(mains.length == 2, s"expected 2 v2 checkpoints: ${mains.toSeq}")
        def sidecars(f: java.io.File): Set[String] = {
          val hp = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
          graft.delta.V2Checkpoints.readMain(s, log.logPath,
              hp.getFileSystem(log.hadoopConf).getFileStatus(hp),
              log.hadoopConf)
            .sidecars.map(_.path).toSet
        }
        val carried =
          if (sidecars(mains(0)).intersect(sidecars(mains(1))).nonEmpty) 1
          else 0
        // replay MUST go through the carried checkpoint now
        (0L to 4L).foreach(v =>
          new java.io.File(logDir, f"$v%020d.json").delete())
        graft.delta.DeltaLog.clearCache()
        DeltaTable.forPath(s, path).toDF
          .groupBy($"l_linenumber")
          .agg(count(lit(1)).as("n"),
            sum($"l_quantity".cast("decimal(14,2)")).cast("double").as("qty"))
          .withColumn("carried", lit(carried))
      },
      Some("""
        SELECT l_linenumber, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS qty,
               CAST(1 AS INT) AS carried
        FROM lineitem GROUP BY 1""")),

    // Full streaming pipeline (F1-F8): delta source → filter/transform →
    // exactly-once delta sink, then aggregate the sink table.
    QueryDef(
      "delta_streaming_pipeline",
      (s, dir) => {
        import s.implicits._
        val src = tmp("stream_src")
        val dst = tmp("stream_dst")
        val ckpt = tmp("stream_ckpt")
        val orders = t(s, dir, "orders")
        // three commits → the stream sees snapshot + subsequent versions
        DeltaTable.write(orders.filter($"o_orderstatus" === "F"), src, SaveMode.Overwrite)
        DeltaTable.write(orders.filter($"o_orderstatus" === "O"), src)
        DeltaTable.write(orders.filter($"o_orderstatus" === "P"), src)
        val q = s.readStream.format("graft-delta").load(src)
          .filter($"o_totalprice" > 50000.0)
          .writeStream.format("graft-delta")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(dst)
        q.awaitTermination(300000)
        DeltaTable.forPath(s, dst).toDF
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
               sum($"o_totalprice".cast(DecimalType(12, 2))).cast("double").as("sum_price"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM orders WHERE o_totalprice > 50000.0
        GROUP BY o_orderpriority""")),

    // Range-sorted write + date-range scan: file-level data skipping from
    // AddFile.stats min/max prunes most files before the parquet read (the
    // 100 TB scale path — see write.StatsCollector / read.DataSkipping).
    QueryDef(
      "delta_data_skipping",
      (s, dir) => {
        import s.implicits._
        val path = tmp("skipping")
        DeltaTable.write(
          t(s, dir, "lineitem").repartitionByRange(16, $"l_shipdate"),
          path, SaveMode.Overwrite)
        DeltaTable.forPath(s, path).toDF
          .filter($"l_shipdate".between("1994-01-01", "1994-03-31"))
          .groupBy($"l_linestatus")
          .agg(count(lit(1)).as("n"),
               sum($"l_extendedprice".cast(DecimalType(14, 2))).cast("double").as("rev"))
      },
      Some("""
        SELECT l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS rev
        FROM lineitem WHERE l_shipdate BETWEEN '1994-01-01' AND '1994-03-31'
        GROUP BY l_linestatus""")),

    // Change data feed: row-level diffs for an update + delete sequence,
    // aggregated by change type and mirrored arithmetically in DuckDB.
    QueryDef(
      "delta_cdf",
      (s, dir) => {
        import s.implicits._
        val path = tmp("cdf")
        DeltaTable.write(
          t(s, dir, "customer").repartitionByRange(4, $"c_custkey"), path,
          SaveMode.Overwrite,
          configuration = Map("delta.enableChangeDataFeed" -> "true"))
        val table = DeltaTable.forPath(s, path)
        table.update($"c_acctbal" < 0.0, Map("c_mktsegment" -> lit("NEGBAL")))
        table.delete($"c_acctbal" > 9000.0)
        table.changes(1, 2)
          .groupBy(col("_change_type"), col("_commit_version").as("v"))
          .agg(count(lit(1)).as("n"),
               sum($"c_custkey").as("sum_key"))
      },
      Some("""
        WITH upd AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0.0),
        del AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
        SELECT * FROM (
          SELECT 'update_preimage' AS _change_type, CAST(1 AS BIGINT) AS v,
                 COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS sum_key FROM upd
          UNION ALL
          SELECT 'update_postimage', CAST(1 AS BIGINT),
                 COUNT(*), CAST(SUM(c_custkey) AS BIGINT) FROM upd
          UNION ALL
          SELECT 'delete', CAST(2 AS BIGINT),
                 COUNT(*), CAST(SUM(c_custkey) AS BIGINT) FROM del
        ) t"""))
      ,

    // MERGE INTO: matched rows update, unmatched rows insert (one txn).
    QueryDef(
      "delta_merge_upsert",
      (s, dir) => {
        import s.implicits._
        val path = tmp("merge")
        val orders = t(s, dir, "orders")
        DeltaTable.write(
          orders.filter($"o_orderstatus" === "F")
            .repartitionByRange(4, $"o_orderkey"),
          path, SaveMode.Overwrite)
        val table = DeltaTable.forPath(s, path)
        val sourceUpd = orders
          .filter($"o_orderstatus" === "F" && $"o_totalprice" > 200000.0)
          .withColumn("o_orderpriority", lit("X-MERGED"))
        val sourceIns = orders
          .filter($"o_orderstatus" === "O" && $"o_totalprice" > 300000.0)
        table.merge(sourceUpd.unionByName(sourceIns),
            col("t.o_orderkey") === col("s.o_orderkey"))
          .whenMatchedUpdate(Map("o_orderpriority" -> col("s.o_orderpriority")))
          .whenNotMatchedInsertAll()
          .execute()
        table.toDF
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
               sum($"o_totalprice".cast(DecimalType(14, 2))).cast("double").as("total"))
      },
      Some("""
        WITH target AS (SELECT * FROM orders WHERE o_orderstatus = 'F'),
        merged AS (
          SELECT CASE WHEN o_totalprice > 200000.0 THEN 'X-MERGED'
                      ELSE o_orderpriority END AS o_orderpriority,
                 o_totalprice
          FROM target
          UNION ALL
          SELECT o_orderpriority, o_totalprice FROM orders
          WHERE o_orderstatus = 'O' AND o_totalprice > 300000.0
        )
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
        FROM merged GROUP BY o_orderpriority""")),

    // Multi-clause conditional MERGE: ordered WHEN clauses, first
    // applicable wins per row — delete cheap matched rows, conditionally
    // update the expensive ones, insert a conditional slice of the
    // unmatched source (the full delta-spark clause surface).
    QueryDef(
      "delta_merge_conditional",
      (s, dir) => {
        import s.implicits._
        val path = tmp("mergecond")
        val orders = t(s, dir, "orders")
        DeltaTable.write(
          orders.filter($"o_orderstatus" === "F")
            .repartitionByRange(4, $"o_orderkey"),
          path, SaveMode.Overwrite)
        val table = DeltaTable.forPath(s, path)
        val source = orders.filter($"o_orderstatus" =!= "P")
        table.merge(source, col("t.o_orderkey") === col("s.o_orderkey"))
          .whenMatchedDelete(col("t.o_totalprice") < 50000.0)
          .whenMatchedUpdate(col("s.o_totalprice") > 250000.0,
            Map("o_orderpriority" -> lit("X-COND")))
          .whenNotMatchedInsert(col("s.o_totalprice") > 350000.0,
            Map("o_orderkey" -> col("s.o_orderkey"),
              "o_custkey" -> col("s.o_custkey"),
              "o_orderstatus" -> col("s.o_orderstatus"),
              "o_totalprice" -> col("s.o_totalprice"),
              "o_orderpriority" -> lit("X-NEW")))
          .execute()
        table.toDF
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
               sum($"o_totalprice".cast(DecimalType(14, 2))).cast("double").as("total"))
      },
      Some("""
        WITH target AS (SELECT * FROM orders WHERE o_orderstatus = 'F'),
        kept AS (
          SELECT CASE WHEN o_totalprice > 250000.0 THEN 'X-COND'
                      ELSE o_orderpriority END AS o_orderpriority,
                 o_totalprice
          FROM target WHERE NOT (o_totalprice < 50000.0)
        ),
        inserted AS (
          SELECT 'X-NEW' AS o_orderpriority, o_totalprice
          FROM orders
          WHERE o_orderstatus <> 'P'
            AND o_totalprice > 350000.0
            AND o_orderkey NOT IN (SELECT o_orderkey FROM target)
        ),
        merged AS (SELECT * FROM kept UNION ALL SELECT * FROM inserted)
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
        FROM merged GROUP BY o_orderpriority""")),

    // WHEN NOT MATCHED BY SOURCE: target rows the source no longer
    // names either age out (delete) or mark stale (update) — the
    // source-drives-the-table reconciliation shape.
    QueryDef(
      "delta_merge_by_source",
      (s, dir) => {
        import s.implicits._
        val path = tmp("mergebysrc")
        val orders = t(s, dir, "orders")
        DeltaTable.write(
          orders.filter($"o_orderstatus" === "F")
            .repartitionByRange(4, $"o_orderkey"),
          path, SaveMode.Overwrite)
        val table = DeltaTable.forPath(s, path)
        val source = orders
          .filter($"o_orderstatus" === "F" && $"o_totalprice" > 150000.0)
        table.merge(source, col("t.o_orderkey") === col("s.o_orderkey"))
          .whenMatchedUpdate(Map("o_orderpriority" -> lit("X-KEPT")))
          .whenNotMatchedBySourceDelete(col("t.o_totalprice") < 30000.0)
          .whenNotMatchedBySourceUpdate(
            Map("o_orderpriority" -> lit("X-STALE")))
          .execute()
        table.toDF
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
               sum($"o_totalprice".cast(DecimalType(14, 2))).cast("double").as("total"))
      },
      Some("""
        WITH target AS (SELECT * FROM orders WHERE o_orderstatus = 'F'),
        res AS (
          SELECT CASE WHEN o_totalprice > 150000.0 THEN 'X-KEPT'
                      ELSE 'X-STALE' END AS o_orderpriority,
                 o_totalprice
          FROM target
          WHERE NOT (o_totalprice <= 150000.0 AND o_totalprice < 30000.0)
        )
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
        FROM res GROUP BY o_orderpriority""")),

    // Identity columns (writer 6): machine-assigned, unique, at-or-above
    // start — the VALUES are engine-chosen (gaps allowed by protocol), so
    // the oracle checks the invariants, not the sequence.
    QueryDef(
      "delta_identity",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
        val path = tmp("identity")
        val docs = t(s, dir, "documents").select($"text", $"lang")
        DeltaTable.create(s, path, StructType(Seq(
            StructField("row_id", LongType),
            StructField("text", StringType),
            StructField("lang", StringType))),
          identityColumns = Map("row_id" -> ((1L, 1L))))
        DeltaTable.write(docs, path)
        DeltaTable.write(docs.filter($"lang" === "en"), path)
        DeltaTable.forPath(s, path).toDF.agg(
          count(lit(1)).as("n"),
          countDistinct($"row_id").as("distinct_ids"),
          sum(when($"row_id" < 1L, 1L).otherwise(0L)).as("below_start"))
      },
      Some("""
        SELECT COUNT(*) AS n, COUNT(*) AS distinct_ids,
               CAST(0 AS BIGINT) AS below_start
        FROM (SELECT text FROM documents
              UNION ALL
              SELECT text FROM documents WHERE lang = 'en')""")),

    // Rewrite DML: UPDATE and DELETE with data predicates (file selection
    // via partition pruning + stats skipping, matched files rewritten).
    QueryDef(
      "delta_dml_update_delete",
      (s, dir) => {
        import s.implicits._
        val path = tmp("dml")
        DeltaTable.write(
          t(s, dir, "orders").repartitionByRange(8, $"o_orderkey"),
          path, SaveMode.Overwrite)
        val table = DeltaTable.forPath(s, path)
        table.update(
          $"o_orderstatus" === "F" && $"o_totalprice" < 50000.0,
          Map("o_orderpriority" -> lit("9-REPRICED")))
        table.delete($"o_totalprice" >= 400000.0)
        table.toDF
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
               sum($"o_totalprice".cast(DecimalType(14, 2))).cast("double").as("total"))
      },
      Some("""
        SELECT CASE WHEN o_orderstatus = 'F' AND o_totalprice < 50000.0
                    THEN '9-REPRICED' ELSE o_orderpriority END AS o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
        FROM orders WHERE o_totalprice < 400000.0
        GROUP BY 1""")),

    // OPTIMIZE: bin-pack a deliberately fragmented table, then prove the
    // data is byte-identical and the file count collapsed (the small-file
    // problem is the canonical 100 TB scan killer).
    QueryDef(
      "delta_compaction",
      (s, dir) => {
        import s.implicits._
        val path = tmp("compact")
        DeltaTable.write(t(s, dir, "orders").repartition(40), path,
          SaveMode.Overwrite)
        val table = DeltaTable.forPath(s, path)
        table.compact()
        val nFiles = graft.delta.DeltaLog.forTable(s, path)
          .update().allFiles.size
        table.toDF
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"),
               sum($"o_totalprice".cast(DecimalType(14, 2))).cast("double").as("total"),
               lit(if (nFiles <= 4) 1 else 0).as("compacted_ok"))
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total,
               CAST(1 AS INT) AS compacted_ok
        FROM orders GROUP BY o_orderstatus""")),

    // Full DDL lifecycle through the DSv2 catalog (F9): CREATE TABLE,
    // INSERT, ALTER TABLE ADD COLUMNS, evolved INSERT, read back.
    QueryDef(
      "delta_sql_ddl",
      (s, dir) => {
        import s.implicits._
        val wh = warehouse("graftc")
        s.conf.set("spark.sql.catalog.graftc",
          classOf[graft.sql.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.graftc.warehouse", wh)
        t(s, dir, "nation").createOrReplaceTempView("nation_src")
        s.sql("DROP TABLE IF EXISTS graftc.db.nation_ddl")
        s.sql("""CREATE TABLE graftc.db.nation_ddl
                 (n_nationkey INT, n_name STRING, n_regionkey INT)""")
        s.sql("""INSERT INTO graftc.db.nation_ddl
                 SELECT n_nationkey, n_name, n_regionkey FROM nation_src""")
        s.sql("ALTER TABLE graftc.db.nation_ddl ADD COLUMNS (zone STRING)")
        s.sql("""INSERT INTO graftc.db.nation_ddl
                 SELECT n_nationkey + 100, n_name, n_regionkey, 'x'
                 FROM nation_src WHERE n_regionkey = 0""")
        s.sql("""SELECT n_regionkey, COUNT(*) AS n, COUNT(zone) AS n_zoned
                 FROM graftc.db.nation_ddl GROUP BY n_regionkey""")
      },
      Some("""
        SELECT n_regionkey,
               CAST(COUNT(*) + COUNT(CASE WHEN n_regionkey = 0 THEN 1 END)
                 AS BIGINT) AS n,
               CAST(COUNT(CASE WHEN n_regionkey = 0 THEN 1 END) AS BIGINT)
                 AS n_zoned
        FROM nation GROUP BY n_regionkey""")),

    // SQL maintenance surface: OPTIMIZE and VACUUM statements (extension
    // grammar) compact a multi-commit table and prove data unchanged and
    // the file count reduced.
    QueryDef(
      "delta_sql_maintenance",
      (s, dir) => {
        import s.implicits._
        val wh = warehouse("graftm")
        s.conf.set("spark.sql.catalog.graftm",
          classOf[graft.sql.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.graftm.warehouse", wh)
        t(s, dir, "supplier").createOrReplaceTempView("supplier_src")
        s.sql("DROP TABLE IF EXISTS graftm.db.supp_maint")
        s.sql("""CREATE TABLE graftm.db.supp_maint
                 (s_suppkey BIGINT, s_nationkey BIGINT, s_acctbal DOUBLE)""")
        (0 until 4).foreach { i =>
          s.sql(s"""INSERT INTO graftm.db.supp_maint
                    SELECT s_suppkey, s_nationkey, s_acctbal
                    FROM supplier_src WHERE s_suppkey % 4 = $i""")
        }
        val path = s"$wh/db/supp_maint"
        val before = graft.delta.DeltaLog.forTable(s, path).update().numOfFiles
        s.sql("OPTIMIZE graftm.db.supp_maint")
        s.sql(s"VACUUM '$path' RETAIN 168 HOURS")
        val after = graft.delta.DeltaLog.forTable(s, path).update().numOfFiles
        s.sql("""SELECT s_nationkey, COUNT(*) AS n,
                 CAST(SUM(CAST(s_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS bal
                 FROM graftm.db.supp_maint GROUP BY s_nationkey""")
          .withColumn("compacted", lit(if (after < before) 1 else 0))
      },
      Some("""
        SELECT s_nationkey, COUNT(*) AS n,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS bal,
               CAST(1 AS INT) AS compacted
        FROM supplier GROUP BY s_nationkey""")),

    // FSCK REPAIR TABLE ([[graft.delta.DeltaTable.fsckRepair]]): one of
    // three single-file commits vanishes OUT-OF-BAND (no log entry);
    // DRY RUN reports it, the repair removes its entry, and the oracle
    // recomputes the surviving slices from raw data — a hash match
    // proves the repair dropped exactly the vanished file's rows.
    QueryDef(
      "delta_fsck",
      (s, dir) => {
        import s.implicits._
        val path = tmp("fsck")
        val sup = t(s, dir, "supplier")
        (0 until 3).foreach { i =>
          graft.delta.DeltaTable.write(
            sup.filter($"s_suppkey" % 3 === i).coalesce(1), path,
            if (i == 0) SaveMode.Overwrite else SaveMode.Append)
        }
        val log = graft.delta.DeltaLog.forTable(s, path)
        // the slice-1 file (commit 1's single AddFile) vanishes
        val victim = log.getChanges(1).toSeq.find(_._1 == 1L).get._2
          .collectFirst { case a: graft.delta.AddFile => a.path }.get
        val vf = new java.io.File(graft.delta.read.PartitionUtils
          .absolutePath(log.dataPath, victim).toUri.getPath)
        require(vf.delete(), s"victim must exist: $vf")
        val tbl = graft.delta.DeltaTable.forPath(s, path)
        val dry = tbl.fsckRepair(dryRun = true)
        val fixed = tbl.fsckRepair()
        tbl.toDF.groupBy($"s_nationkey")
          .agg(count(lit(1)).as("n"), sum($"s_suppkey").as("key_sum"))
          .withColumn("repaired", lit(fixed))
          .withColumn("dry_run_count", lit(dry))
      },
      Some("""
        SELECT s_nationkey, COUNT(*) AS n,
               CAST(SUM(s_suppkey) AS BIGINT) AS key_sum,
               CAST(1 AS BIGINT) AS repaired,
               CAST(1 AS BIGINT) AS dry_run_count
        FROM supplier WHERE s_suppkey % 3 <> 1 GROUP BY 1""")),

    // Metadata-only aggregates ([[graft.GraftExtensions.MetadataOnlyCount]]):
    // COUNT(*)/COUNT(col)/MIN/MAX over a bare Delta scan answer from
    // AddFile stats — the query asserts IN-PLAN that no file scan
    // survives, then the oracle recomputes the values from raw data.
    QueryDef(
      "delta_metadata_agg",
      (s, dir) => {
        import s.implicits._
        val path = tmp("metaagg")
        DeltaTable.write(t(s, dir, "orders").repartition(4), path,
          SaveMode.Overwrite)
        val agg = DeltaTable.forPath(s, path).toDF
          .agg(count(lit(1)).as("n"),
               min($"o_orderkey").as("min_key"),
               max($"o_orderkey").as("max_key"),
               count($"o_orderpriority").as("n_priorities"),
               min($"o_orderdate").as("min_date"))
        require(!agg.queryExecution.executedPlan.toString.contains("FileScan"),
          s"metadata aggregate must not scan:\n${agg.queryExecution.executedPlan}")
        agg
      },
      Some("""
        SELECT COUNT(*) AS n, MIN(o_orderkey) AS min_key,
               MAX(o_orderkey) AS max_key,
               COUNT(o_orderpriority) AS n_priorities,
               MIN(o_orderdate) AS min_date
        FROM orders""")),

    // The GROUPED metadata path: per-partition count + data-column
    // min/max folded entirely from the log (in-plan no-scan assert);
    // the oracle groups the raw rows.
    QueryDef(
      "delta_metadata_agg_grouped",
      (s, dir) => {
        import s.implicits._
        val path = tmp("metaaggg")
        DeltaTable.write(t(s, dir, "orders").repartition(4), path,
          SaveMode.Overwrite, partitionBy = Seq("o_orderstatus"))
        val agg = DeltaTable.forPath(s, path).toDF
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"),
               min($"o_orderkey").as("min_key"),
               max($"o_orderkey").as("max_key"))
        require(!agg.queryExecution.executedPlan.toString.contains("FileScan"),
          s"grouped metadata aggregate must not scan:\n${agg.queryExecution.executedPlan}")
        agg
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n, MIN(o_orderkey) AS min_key,
               MAX(o_orderkey) AS max_key
        FROM orders GROUP BY 1""")),

    // VACUUM LITE lifecycle: partition-pruned DELETE leaves tombstones,
    // the lite vacuum derives its candidates from the LOG (no table
    // listing) and must physically remove them; the VACUUM END logging
    // commit (the next run's boundary) is asserted in-query, and the
    // surviving table must aggregate exactly to the oracle.
    QueryDef(
      "delta_vacuum_lite",
      (s, dir) => {
        import s.implicits._
        val path = tmp("vaclite")
        // zero retention: the DELETE's tombstones (strictly older than
        // the vacuum's later clock read) are immediately eligible
        DeltaTable.write(t(s, dir, "supplier"), path, SaveMode.Overwrite,
          partitionBy = Seq("s_nationkey"),
          configuration =
            Map("delta.deletedFileRetentionDuration" -> "interval 0 hours"))
        val table = DeltaTable.forPath(s, path)
        table.deleteWhere($"s_nationkey" === 0)
        val deleted = s.sql(s"VACUUM '$path' LITE").collect().head.getLong(1)
        require(deleted >= 1, "lite vacuum deleted nothing")
        val ops = graft.delta.DeltaLog.forTable(s, path)
          .history().flatMap(_.operation)
        require(ops.contains("VACUUM END"), s"no VACUUM END logged: $ops")
        table.toDF.groupBy($"s_nationkey")
          .agg(count(lit(1)).as("n"),
               sum($"s_acctbal".cast(DecimalType(14, 2))).cast("double")
                 .as("bal"))
      },
      Some("""
        SELECT s_nationkey, COUNT(*) AS n,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS bal
        FROM supplier WHERE s_nationkey <> 0 GROUP BY 1""")),

    // GENERATE symlink_format_manifest: after a partition DELETE the
    // manifest tree must name EXACTLY the active files — proven by
    // aggregating the data read back THROUGH the manifests (raw parquet,
    // no Delta log) against the oracle's post-delete recompute.
    // Partition columns are NOT in the data files (Delta stores them in
    // metadata), so the aggregate uses data columns only.
    QueryDef(
      "delta_symlink_manifest",
      (s, dir) => {
        import s.implicits._
        val path = tmp("symman")
        DeltaTable.write(t(s, dir, "nation"), path, SaveMode.Overwrite,
          partitionBy = Seq("n_regionkey"))
        val tbl = DeltaTable.forPath(s, path)
        tbl.deleteWhere($"n_regionkey" === 4)
        require(tbl.generateSymlinkManifest() >= 1, "no manifest written")
        val root = java.nio.file.Paths.get(path,
          graft.delta.SymlinkManifest.ManifestDirName)
        val uris = java.nio.file.Files.walk(root).iterator()
        val files = scala.collection.mutable.ArrayBuffer.empty[String]
        while (uris.hasNext) {
          val p = uris.next()
          if (p.getFileName.toString == "manifest")
            files ++= java.nio.file.Files.readAllLines(p)
              .toArray(Array.empty[String]).filter(_.nonEmpty)
        }
        s.read.parquet(files.toSeq: _*)
          .agg(count(lit(1)).as("n"),
               sum($"n_nationkey".cast("long")).as("key_sum"))
      },
      Some("""
        SELECT COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
        FROM nation WHERE n_regionkey <> 4""")),

    // OPTIMIZE ZORDER: re-cluster by two independent columns, then prove
    // data unchanged AND that the multi-column predicate's scan touches a
    // strict subset of the files (stats-based skipping now bites).
    QueryDef(
      "delta_zorder",
      (s, dir) => {
        import s.implicits._
        val path = tmp("zorder")
        DeltaTable.write(t(s, dir, "lineitem").repartition(20), path,
          SaveMode.Overwrite)
        val table = DeltaTable.forPath(s, path)
        val total = graft.delta.DeltaLog.forTable(s, path).update().sizeInBytes
        table.compact(targetFileBytes = total / 16 + 1,
          zOrderBy = Seq("l_orderkey", "l_partkey"))
        val log = graft.delta.DeltaLog.forTable(s, path)
        val snap = log.update()
        val pruned = new graft.delta.read.DeltaFileIndex(s, snap).listFiles(
          Nil,
          Seq(graft.delta.read.PartitionUtils.resolveFilter(s,
            snap.metadata.schema,
            $"l_orderkey" <= 1000L && $"l_partkey" <= 2000L)))
          .map(_.files.length).sum
        val skippingBites = pruned < snap.numOfFiles
        table.toDF
          .filter($"l_orderkey" <= 1000L && $"l_partkey" <= 2000L)
          .agg(count(lit(1)).as("n"),
               sum($"l_quantity".cast(DecimalType(12, 2))).cast("double").as("qty"),
               lit(if (skippingBites) 1 else 0).as("zorder_skips"))
      },
      Some("""
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
               CAST(1 AS INT) AS zorder_skips
        FROM lineitem WHERE l_orderkey <= 1000 AND l_partkey <= 2000""")),

    // SQL surface (F9): CREATE VIEW over the delta format, transactional
    // INSERT INTO through the GraftExtensions analyzer rule, read back.
    QueryDef(
      "delta_sql_insert",
      (s, dir) => {
        import s.implicits._
        val path = tmp("sqlins")
        val n = t(s, dir, "nation")
        DeltaTable.write(n.filter($"n_regionkey" =!= 0), path, SaveMode.Overwrite)
        s.sql(s"""CREATE OR REPLACE TEMPORARY VIEW nation_delta
                  USING `graft-delta` OPTIONS (path '$path')""")
        s.sql("""INSERT INTO nation_delta
                 SELECT n_nationkey + 100, n_name, n_regionkey
                 FROM nation_delta WHERE n_regionkey = 1""")
        s.catalog.dropTempView("nation_delta")
        DeltaTable.forPath(s, path).toDF
          .groupBy($"n_regionkey")
          .agg(count(lit(1)).as("n"),
               sum($"n_nationkey").as("sum_key"))
      },
      Some("""
        WITH base AS (SELECT * FROM nation WHERE n_regionkey <> 0),
        ins AS (SELECT n_nationkey + 100 AS n_nationkey, n_regionkey
                FROM base WHERE n_regionkey = 1),
        unioned AS (SELECT n_nationkey, n_regionkey FROM base
                    UNION ALL SELECT n_nationkey, n_regionkey FROM ins)
        SELECT n_regionkey, COUNT(*) AS n,
               CAST(SUM(n_nationkey) AS BIGINT) AS sum_key
        FROM unioned GROUP BY n_regionkey""")),

    // Commit history as data (M12) — deterministic operation sequence.
    QueryDef(
      "delta_history_ops",
      (s, dir) => {
        import s.implicits._
        val path = tmp("history")
        val n = t(s, dir, "nation")
        DeltaTable.write(n, path, SaveMode.Overwrite, partitionBy = Seq("n_regionkey"))
        DeltaTable.write(n, path)
        DeltaTable.forPath(s, path).deleteWhere($"n_regionkey" === 0)
        DeltaTable.forPath(s, path).history()
          .select($"version", $"operation", $"isBlindAppend")
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(2 AS BIGINT), 'DELETE', false),
          (CAST(1 AS BIGINT), 'WRITE', true),
          (CAST(0 AS BIGINT), 'CREATE TABLE', true))
          AS t(version, operation, isBlindAppend)""")),

    // CHECK constraints (writer-protocol-3): a violating append is blocked
    // atomically while the constraint is active, admitted after DROP
    // CONSTRAINT; final state proves both enforcement and release.
    QueryDef(
      "delta_constraints",
      (s, dir) => {
        import s.implicits._
        val path = tmp("constraints")
        val cust = t(s, dir, "customer")
        DeltaTable.write(cust, path, SaveMode.Overwrite)
        val tbl = DeltaTable.forPath(s, path)
        tbl.addConstraint("acctbal_floor", "c_acctbal > -2000")
        val bad = cust.filter($"c_nationkey" === 1)
          .withColumn("c_acctbal", -$"c_acctbal" - 10000.0)
        val good = cust.filter($"c_nationkey" === 2)
        try {
          DeltaTable.write(bad, path)
          throw new IllegalStateException("constraint did not block")
        } catch {
          case e: IllegalStateException => throw e
          case _: Exception => // expected: the violating batch is rejected
        }
        DeltaTable.write(good, path)
        tbl.dropConstraint("acctbal_floor")
        DeltaTable.write(bad, path)
        tbl.toDF
          .groupBy(when($"c_acctbal" < -2000.0, "neg").otherwise("ok")
            .as("bucket"))
          .agg(count(lit(1)).as("n"),
               sum($"c_acctbal".cast(DecimalType(12, 2))).cast("double")
                 .as("sum_bal"))
      },
      Some("""
        WITH final AS (
          SELECT c_acctbal FROM customer
          UNION ALL
          SELECT c_acctbal FROM customer WHERE c_nationkey = 2
          UNION ALL
          SELECT -c_acctbal - 10000.0 AS c_acctbal FROM customer
          WHERE c_nationkey = 1)
        SELECT CASE WHEN c_acctbal < -2000.0 THEN 'neg' ELSE 'ok' END AS bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
        FROM final GROUP BY 1""")),

    // Column defaults (writer feature allowColumnDefaults): SET DEFAULT
    // affects future omitting appends only — seeded rows keep their
    // values, an omitting append materializes the default at write time,
    // a providing append wins, and changing the default affects only
    // later writes. The final grouped state proves all four.
    QueryDef(
      "delta_column_defaults",
      (s, dir) => {
        import s.implicits._
        val path = tmp("coldefaults")
        val cust = t(s, dir, "customer")
        DeltaTable.write(
          cust.filter($"c_nationkey" < 5)
            .select($"c_custkey", $"c_acctbal", lit("seed").as("status")),
          path, SaveMode.Overwrite)
        val tbl = DeltaTable.forPath(s, path)
        tbl.setColumnDefault("status", "'standard'")
        // omits status -> 'standard'
        DeltaTable.write(
          cust.filter($"c_nationkey" >= 5 && $"c_nationkey" < 10)
            .select($"c_custkey", $"c_acctbal"), path)
        // provides status -> provided value wins over the default
        DeltaTable.write(
          cust.filter($"c_nationkey" === 10)
            .select($"c_custkey", $"c_acctbal", lit("vip").as("status")),
          path)
        tbl.setColumnDefault("status", "upper('late')")
        DeltaTable.write(
          cust.filter($"c_nationkey" === 11)
            .select($"c_custkey", $"c_acctbal"), path)
        tbl.toDF
          .groupBy($"status")
          .agg(count(lit(1)).as("n"),
               sum($"c_acctbal".cast(DecimalType(12, 2))).cast("double")
                 .as("sum_bal"))
      },
      Some("""
        WITH final AS (
          SELECT c_acctbal, 'seed' AS status FROM customer WHERE c_nationkey < 5
          UNION ALL
          SELECT c_acctbal, 'standard' FROM customer
          WHERE c_nationkey >= 5 AND c_nationkey < 10
          UNION ALL
          SELECT c_acctbal, 'vip' FROM customer WHERE c_nationkey = 10
          UNION ALL
          SELECT c_acctbal, 'LATE' FROM customer WHERE c_nationkey = 11)
        SELECT status, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
        FROM final GROUP BY 1""")),

    // Shallow CLONE: zero-copy fork, then mutate the clone — the source
    // must stay intact (asserted in-flight) while the clone's state is
    // the delete's answer.
    QueryDef(
      "delta_clone",
      (s, dir) => {
        import s.implicits._
        val src = tmp("clone_src")
        val dst = tmp("clone_dst") + "/t"
        val orders = t(s, dir, "orders")
        DeltaTable.write(orders, src, SaveMode.Overwrite)
        DeltaTable.forPath(s, src).cloneTo(dst)
        val clone = DeltaTable.forPath(s, dst)
        clone.delete($"o_orderstatus" === "F")
        require(DeltaTable.forPath(s, src).toDF.count() == orders.count(),
          "clone mutation leaked into the source table")
        clone.toDF.groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"),
               sum($"o_totalprice".cast(DecimalType(12, 2))).cast("double")
                 .as("sum_price"))
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM orders WHERE o_orderstatus <> 'F'
        GROUP BY o_orderstatus""")),

    // DEEP CLONE: an independent physical copy. The query DV-deletes in
    // the source, deep clones, then DESTROYS the source directory
    // entirely before aggregating the clone — only a real byte copy
    // (including the deletion-vector files) can answer.
    QueryDef(
      "delta_deep_clone",
      (s, dir) => {
        import s.implicits._
        val src = tmp("dclone_src") + "/t"
        val dst = tmp("dclone_dst") + "/t"
        val cust = t(s, dir, "customer")
        DeltaTable.write(cust, src,
          configuration = Map("delta.enableDeletionVectors" -> "true"))
        DeltaTable.forPath(s, src).delete($"c_mktsegment" === "BUILDING")
        s.sql(s"CREATE TABLE '$dst' DEEP CLONE '$src'")
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
        }
        rm(new java.io.File(src))
        graft.delta.DeltaLog.invalidate(s, src)
        DeltaTable.forPath(s, dst).toDF.groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n"),
               sum($"c_acctbal".cast(DecimalType(12, 2))).cast("double")
                 .as("sum_bal"))
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
        FROM customer WHERE c_mktsegment <> 'BUILDING'
        GROUP BY c_mktsegment""")),

    // replaceWhere: one transactional commit swaps the 1-URGENT partition
    // for a recomputed frame (price +1000); other partitions' files are
    // untouched.
    QueryDef(
      "delta_replace_where",
      (s, dir) => {
        import s.implicits._
        val path = tmp("replace_where")
        val orders = t(s, dir, "orders")
        DeltaTable.write(orders, path, SaveMode.Overwrite,
          partitionBy = Seq("o_orderpriority"))
        val urgent = orders.filter($"o_orderpriority" === "1-URGENT")
          .withColumn("o_totalprice", $"o_totalprice" + 1000.0)
        DeltaTable.forPath(s, path)
          .replaceWhere(urgent, $"o_orderpriority" === "1-URGENT")
        DeltaTable.forPath(s, path).toDF
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
               sum($"o_totalprice".cast(DecimalType(14, 2))).cast("double")
                 .as("sum_price"))
      },
      Some("""
        WITH final AS (
          SELECT o_orderpriority, o_totalprice FROM orders
          WHERE o_orderpriority <> '1-URGENT'
          UNION ALL
          SELECT o_orderpriority, o_totalprice + 1000.0 AS o_totalprice
          FROM orders WHERE o_orderpriority = '1-URGENT')
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
        FROM final GROUP BY o_orderpriority""")),

    // Generated partition column (writer-protocol-4): the table declares
    // day = date_format(ts, ...); raw events append WITHOUT day and land
    // date-partitioned; the day-range filter prunes at the file level.
    QueryDef(
      "delta_generated_partition",
      (s, dir) => {
        import s.implicits._
        val path = tmp("genpart")
        val ev = t(s, dir, "events")
          .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        DeltaTable.create(s, path,
          org.apache.spark.sql.types.StructType(ev.schema.fields :+
            org.apache.spark.sql.types.StructField("day",
              org.apache.spark.sql.types.StringType)),
          partitionBy = Seq("day"),
          generatedColumns = Map("day" -> "date_format(ts, 'yyyy-MM-dd')"))
        DeltaTable.write(ev, path) // no day column: the engine computes it
        DeltaTable.forPath(s, path).toDF
          .filter($"day" >= "2024-01-10" && $"day" <= "2024-01-12")
          .groupBy($"day", $"event_type")
          .agg(count(lit(1)).as("n"),
               sum($"value".cast(DecimalType(18, 6))).cast("double")
                 .as("sum_value"))
      },
      Some("""
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events
        WHERE strftime(ts, '%Y-%m-%d') BETWEEN '2024-01-10' AND '2024-01-12'
        GROUP BY 1, 2""")),

    // CONVERT TO DELTA: adopt a plain partitioned parquet directory in
    // place (zero copies), then prove it is a LIVE table — transactional
    // delete + append — and aggregate the result.
    QueryDef(
      "delta_convert",
      (s, dir) => {
        import s.implicits._
        val path = tmp("convert") + "/t"
        val part = t(s, dir, "part")
        part.write.partitionBy("p_brand").parquet(path)
        DeltaTable.convertToDelta(s, path, Seq("p_brand"))
        val tbl = DeltaTable.forPath(s, path)
        tbl.deleteWhere($"p_brand" === "Brand#11")
        DeltaTable.write(
          part.filter($"p_brand" === "Brand#22")
            .withColumn("p_partkey", $"p_partkey" + 1000000L),
          path)
        tbl.toDF.groupBy($"p_brand")
          .agg(count(lit(1)).as("n"),
               sum($"p_retailprice".cast(DecimalType(14, 2))).cast("double")
                 .as("sum_price"))
      },
      Some("""
        WITH final AS (
          SELECT p_brand, p_retailprice FROM part
          WHERE p_brand <> 'Brand#11'
          UNION ALL
          SELECT p_brand, p_retailprice FROM part WHERE p_brand = 'Brand#22')
        SELECT p_brand, COUNT(*) AS n,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
        FROM final GROUP BY p_brand""")),

    // COPY INTO: idempotent bulk ingestion. Three statements run — batch
    // 1, batch 1+2 (batch 1's files must SKIP), and an exact re-run (a
    // full no-op) — so the aggregate equals exactly one load of each
    // batch iff the per-file tracking works. The oracle is the same
    // aggregate over the two source slices read once each.
    QueryDef(
      "delta_copy_into",
      (s, dir) => {
        import s.implicits._
        val base = tmp("copyinto")
        val tbl = s"$base/t"
        val src = s"$base/src"
        val orders = t(s, dir, "orders")
          .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        DeltaTable.write(orders.limit(0), tbl)
        orders.filter($"o_orderkey" % 4 === 0)
          .coalesce(2).write.parquet(s"$src/b1")
        s.sql(s"COPY INTO '$tbl' FROM '$src' FILEFORMAT = PARQUET").collect()
        orders.filter($"o_orderkey" % 4 === 1)
          .coalesce(2).write.parquet(s"$src/b2")
        val second = s.sql(
          s"COPY INTO '$tbl' FROM '$src' FILEFORMAT = PARQUET").collect().head
        require(second.getLong(3) > 0,
          "second COPY INTO must skip batch 1's already-loaded files")
        val third = s.sql(
          s"COPY INTO '$tbl' FROM '$src' FILEFORMAT = PARQUET").collect().head
        require(third.getLong(1) == 0 && third.getLong(2) == 0,
          "exact re-run must load nothing")
        DeltaTable.forPath(s, tbl).toDF
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"),
               sum($"o_orderkey").as("sum_keys"),
               sum($"o_totalprice".cast(DecimalType(18, 2))).cast("double")
                 .as("sum_price"))
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price
        FROM orders WHERE o_orderkey % 4 IN (0, 1)
        GROUP BY o_orderstatus""")),

    // Per-file Bloom filters: point lookups on an unsorted hash key,
    // where min/max stats cannot prune (every file's range spans the key
    // space). The query PROVES pruning in-flight (requires the scan to
    // open fewer files than the table holds) and returns the probed rows.
    QueryDef(
      "delta_bloom_skipping",
      (s, dir) => {
        import s.implicits._
        val path = tmp("bloom")
        val cust = t(s, dir, "customer")
          .withColumn("ckey", md5(concat(lit("c"), $"c_custkey")))
        DeltaTable.write(cust.repartition(8), path, SaveMode.Overwrite,
          configuration = Map("delta.bloomFilter.columns" -> "ckey"))
        val tbl = DeltaTable.forPath(s, path)
        val probes = (1 to 5).map(i =>
          org.apache.commons.codec.digest.DigestUtils.md5Hex(s"c$i"))
        val q = tbl.toDF.filter($"ckey".isin(probes: _*))
          .select($"c_custkey", $"c_mktsegment",
            $"c_acctbal".cast(DecimalType(12, 2)).cast("double").as("bal"))
        val opened = q.queryExecution.executedPlan.collectLeaves()
          .collectFirst {
            case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
              sc.relation.location
                .listFiles(sc.partitionFilters, sc.dataFilters)
                .map(_.files.length).sum
          }.getOrElse(-1)
        require(opened >= 0 && opened < 8,
          s"bloom skipping did not prune: opened $opened of 8 files")
        q
      },
      Some("""
        SELECT c_custkey, c_mktsegment,
               CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal
        FROM customer
        WHERE md5('c' || CAST(c_custkey AS VARCHAR))
              IN (md5('c1'), md5('c2'), md5('c3'), md5('c4'), md5('c5'))""")),

    // Deletion-vector READS: two single-file commits (even / odd keys in
    // key order, so row position == rank within parity), then a
    // foreign-writer-style commit shades file 0 with an INLINE dv and
    // file 1 with a uuid-FILE dv; the scan's (file, row_index)
    // anti-filter must hide exactly those positions. The oracle replays
    // the position arithmetic with window functions over the raw parquet.
    QueryDef(
      "delta_deletion_vectors",
      (s, dir) => {
        import s.implicits._
        import graft.delta.{DeltaLog, FileNames, JsonCodec, Protocol}
        import graft.delta.dv.{DeletionVectors, RoaringBitmapArray}
        val path = tmp("dv")
        val cust = t(s, dir, "customer")
        DeltaTable.write(
          cust.filter($"c_custkey" % 2 === 0)
            .repartition(1).sortWithinPartitions("c_custkey"),
          path, SaveMode.Overwrite)
        val log = DeltaLog.forTable(s, path)
        val f0 = log.update().allFiles.head
        DeltaTable.write(
          cust.filter($"c_custkey" % 2 === 1)
            .repartition(1).sortWithinPartitions("c_custkey"),
          path)
        val snap = log.update()
        val f1 = snap.allFiles.find(_.path != f0.path).get
        val nEven = cust.filter($"c_custkey" % 2 === 0).count()
        val nOdd = cust.filter($"c_custkey" % 2 === 1).count()
        val dvE = DeletionVectors.inline(
          RoaringBitmapArray((0L until nEven).filter(_ % 5 == 2): _*))
        val dvO = DeletionVectors.writeDvFile(log.dataPath, log.hadoopConf,
          Seq(RoaringBitmapArray((0L until nOdd).filter(_ % 7 == 3): _*))).head
        val actions: Seq[graft.delta.Action] = Seq(
          Protocol(minReaderVersion = 3, minWriterVersion = 7,
            readerFeatures = Some(Seq("deletionVectors")),
            writerFeatures = Some(Seq("deletionVectors"))),
          f0.copy(deletionVector = Some(dvE), dataChange = true),
          f0.remove(dataChange = true),
          f1.copy(deletionVector = Some(dvO), dataChange = true),
          f1.remove(dataChange = true))
        log.store.write(FileNames.deltaFile(log.logPath, snap.version + 1),
          actions.map(JsonCodec.toJson).iterator, overwrite = false,
          log.hadoopConf)
        DeltaTable.forPath(s, path).toDF
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n"),
               sum($"c_acctbal".cast(DecimalType(12, 2))).cast("double")
                 .as("sum_bal"))
      },
      Some("""
        WITH ranked AS (
          SELECT c_mktsegment, c_acctbal, c_custkey % 2 AS par,
                 row_number() OVER (PARTITION BY c_custkey % 2
                                    ORDER BY c_custkey) - 1 AS pos
          FROM customer)
        SELECT c_mktsegment, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
        FROM ranked
        WHERE NOT (par = 0 AND pos % 5 = 2)
          AND NOT (par = 1 AND pos % 7 = 3)
        GROUP BY c_mktsegment""")),

    // Merge-on-read DELETE (delta.enableDeletionVectors), STAGED
    // (VERDICT r13 #5): the old delta_dv_delete monolith spanned write +
    // two DV-shading deletes + OPTIMIZE purge + re-reads in one 6 s bench
    // line, so any mover inside it cost an isolation round-trip to
    // attribute. Three staged queries now partition the lifecycle —
    // _write times the DV-enabled write, _shade times the two bitmap
    // deletes, _purge times the OPTIMIZE purge — sharing one on-disk
    // table through [[dvStage]]. Each stage RESTOREs the table to its
    // input version first (metadata-only, so re-samples time constant
    // work instead of degenerate no-op deletes), and a stage run cold
    // (fresh JVM isolation) builds its prerequisites inline — cumulative
    // timing, deterministic either way. queries/oracleSql iterate in
    // insertion order (ListMap), so the full Verify/Bench runs hit
    // _write -> _shade -> _purge in sequence.
    QueryDef(
      "delta_dv_delete_write",
      (s, dir) => {
        import s.implicits._
        val st = dvStageWrite(s, dir)
        DeltaTable.forPath(s, st.path).toDF
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
               sum($"o_totalprice".cast(DecimalType(12, 2))).cast("double")
                 .as("sum_price"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 AS sum_price
        FROM orders
        GROUP BY o_orderpriority""")),

    QueryDef(
      "delta_dv_delete_shade",
      (s, dir) => {
        import s.implicits._
        val st = dvStageShade(s, dir)
        DeltaTable.forPath(s, st.path).toDF
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
               sum($"o_totalprice".cast(DecimalType(12, 2))).cast("double")
                 .as("sum_price"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 AS sum_price
        FROM orders
        WHERE NOT (o_totalprice > 150000.0)
          AND NOT (o_orderstatus = 'F' AND o_totalprice < 50000.0)
        GROUP BY o_orderpriority""")),

    QueryDef(
      "delta_dv_delete_purge",
      (s, dir) => {
        import s.implicits._
        val st = dvStageShaded(s, dir)
        val table = DeltaTable.forPath(s, st.path)
        // purge the shades; the answer must not move (the oracle SQL is
        // identical to _shade's, so the driver's hash compare enforces it)
        table.compact()
        table.toDF
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
               sum($"o_totalprice".cast(DecimalType(12, 2))).cast("double")
                 .as("sum_price"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 AS sum_price
        FROM orders
        WHERE NOT (o_totalprice > 150000.0)
          AND NOT (o_orderstatus = 'F' AND o_totalprice < 50000.0)
        GROUP BY o_orderpriority""")),

    // VARIANT column lifecycle: semi-structured rows written as variant,
    // a DELETE keyed on a variant_get extraction, then aggregation over
    // extracted fields. Doubles round-trip exactly through the JSON
    // (shortest-repr string -> parse), so the oracle can replay the
    // predicate on the plain source columns.
    QueryDef(
      "delta_variant",
      (s, dir) => {
        import s.implicits._
        val path = tmp("variant")
        DeltaTable.write(
          t(s, dir, "orders").filter($"o_orderkey" <= 3000)
            .selectExpr("o_orderkey",
              "parse_json(concat('{\"status\":\"', o_orderstatus, " +
                "'\",\"price\":', CAST(o_totalprice AS STRING), '}')) AS v"),
          path, SaveMode.Overwrite)
        val table = DeltaTable.forPath(s, path)
        table.delete(expr("variant_get(v, '$.price', 'double') > 200000.0"))
        table.toDF
          .selectExpr("variant_get(v, '$.status', 'string') AS status",
                      "variant_get(v, '$.price', 'double') AS price")
          .groupBy($"status")
          .agg(count(lit(1)).as("n"),
               sum($"price".cast(DecimalType(12, 2))).cast("double")
                 .as("sum_price"))
      },
      Some("""
        SELECT o_orderstatus AS status, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 AS sum_price
        FROM orders
        WHERE o_orderkey <= 3000 AND NOT (o_totalprice > 200000.0)
        GROUP BY o_orderstatus""")),

    // Incremental aggregate maintenance: a grouped materialization folds
    // the CDF of three DML commits (delete, additive update, append)
    // instead of re-scanning the source; the query self-checks against a
    // full recompute, the oracle replays the DML chain in SQL.
    QueryDef(
      "delta_incremental_agg",
      (s, dir) => {
        import s.implicits._
        val src = tmp("incsrc"); val dst = tmp("incdst")
        DeltaTable.write(
          t(s, dir, "lineitem").filter($"l_orderkey" <= 2000)
            .select($"l_orderkey", $"l_suppkey", $"l_returnflag",
                    $"l_quantity".cast(DecimalType(12, 2)).as("qty")),
          src, SaveMode.Overwrite,
          configuration = Map("delta.enableChangeDataFeed" -> "true"))
        graft.delta.IncrementalAgg.maintain(s, src, dst,
          Seq("l_returnflag"), Seq("qty"))
        val table = DeltaTable.forPath(s, src)
        table.delete($"qty" < 10)
        table.update($"l_suppkey" % 7 === 0,
          Map("qty" -> ($"qty" + 5)))
        DeltaTable.write(
          t(s, dir, "lineitem")
            .filter($"l_orderkey" > 2000 && $"l_orderkey" <= 2500)
            .select($"l_orderkey", $"l_suppkey", $"l_returnflag",
                    ($"l_quantity".cast(DecimalType(12, 2)) + 1)
                      .cast(DecimalType(12, 2)).as("qty")),
          src)
        graft.delta.IncrementalAgg.maintain(s, src, dst,
          Seq("l_returnflag"), Seq("qty"))
        val out = DeltaTable.forPath(s, dst).toDF
          .select($"l_returnflag", $"n_rows",
                  $"sum_qty".cast("double").as("sum_qty"))
        // self-check: the folded state must equal a full recompute
        val full = table.toDF.groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n_rows"),
               sum($"qty").cast("double").as("sum_qty"))
        require(out.collect().toSet == full.collect().toSet,
          "incremental state diverged from full recompute")
        out
      },
      Some("""
        WITH base AS (
          SELECT l_orderkey, l_suppkey, l_returnflag,
                 CAST(l_quantity AS DECIMAL(12,2)) AS qty
          FROM lineitem WHERE l_orderkey <= 2000),
        afterdel AS (SELECT * FROM base WHERE NOT (qty < 10)),
        afterupd AS (
          SELECT l_orderkey, l_suppkey, l_returnflag,
                 CASE WHEN l_suppkey % 7 = 0 THEN qty + 5 ELSE qty END AS qty
          FROM afterdel),
        ins AS (
          SELECT l_orderkey, l_suppkey, l_returnflag,
                 CAST(l_quantity AS DECIMAL(12,2)) + 1 AS qty
          FROM lineitem WHERE l_orderkey > 2000 AND l_orderkey <= 2500),
        fin AS (SELECT * FROM afterupd UNION ALL SELECT * FROM ins)
        SELECT l_returnflag, COUNT(*) AS n_rows,
               CAST(SUM(qty) AS DOUBLE) AS sum_qty
        FROM fin GROUP BY l_returnflag""")),

    // Type widening: an int column widens to long WITHOUT rewriting the
    // narrow files, then a post-widening append stores values past
    // Int.MaxValue — the aggregate must read both generations through
    // one wide schema. The oracle replays as a BIGINT union.
    QueryDef(
      "delta_type_widening",
      (s, dir) => {
        import s.implicits._
        val path = tmp("typewiden")
        val li = t(s, dir, "lineitem")
          .filter($"l_orderkey" <= 1000)
          .select($"l_orderkey".cast("int").as("k"),
                  $"l_linenumber".cast("int").as("n"))
        DeltaTable.write(li, path, SaveMode.Overwrite)
        val table = DeltaTable.forPath(s, path)
        table.widenColumnType("k", org.apache.spark.sql.types.LongType)
        DeltaTable.write(
          t(s, dir, "lineitem").filter($"l_orderkey" <= 100)
            .select(($"l_orderkey" + 10000000000L).as("k"),
                    $"l_linenumber".cast("int").as("n")), path)
        require(table.toDF.schema("k").dataType ==
          org.apache.spark.sql.types.LongType, "widening did not apply")
        table.toDF
          .groupBy($"n")
          .agg(count(lit(1)).as("cnt"), sum($"k").as("sum_k"),
               max($"k").as("max_k"))
      },
      Some("""
        WITH u AS (
          SELECT CAST(l_orderkey AS BIGINT) AS k, l_linenumber AS n
          FROM lineitem WHERE l_orderkey <= 1000
          UNION ALL
          SELECT l_orderkey + 10000000000, l_linenumber
          FROM lineitem WHERE l_orderkey <= 100)
        SELECT CAST(n AS INT) AS n, COUNT(*) AS cnt,
               CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k
        FROM u GROUP BY n""")),

    // Row tracking: two deterministic single-file commits reserve
    // contiguous id ranges (file 1 at base 0, file 2 right after), then a
    // deletion-vector DELETE proves survivors KEEP their ids — the oracle
    // replays the assignment with ROW_NUMBER over the same write order.
    QueryDef(
      "delta_row_tracking",
      (s, dir) => {
        import s.implicits._
        val path = tmp("rowtracking")
        val cust = t(s, dir, "customer")
        DeltaTable.write(
          cust.filter($"c_custkey" <= 500).orderBy($"c_custkey").coalesce(1),
          path, SaveMode.Overwrite,
          configuration = Map("delta.enableRowTracking" -> "true",
                              "delta.enableDeletionVectors" -> "true"))
        DeltaTable.write(
          cust.filter($"c_custkey" > 500).orderBy($"c_custkey").coalesce(1),
          path)
        val table = DeltaTable.forPath(s, path)
        table.delete($"c_mktsegment" === "BUILDING")
        // the delete must have SHADED (id stability is only meaningful if
        // the original files survived), not rewritten
        require(table.deltaLog.update().allFiles
          .exists(_.deletionVector.isDefined), "delete did not shade")
        table.toDFWithRowIds
          .select($"c_custkey", $"_row_id", $"_row_commit_version")
      },
      Some("""
        WITH lo AS (
          SELECT c_custkey, c_mktsegment,
                 ROW_NUMBER() OVER (ORDER BY c_custkey) - 1 AS rid
          FROM customer WHERE c_custkey <= 500),
        hi AS (
          SELECT c_custkey, c_mktsegment,
                 (SELECT COUNT(*) FROM customer WHERE c_custkey <= 500) +
                 ROW_NUMBER() OVER (ORDER BY c_custkey) - 1 AS rid
          FROM customer WHERE c_custkey > 500),
        base AS (
          SELECT c_custkey, c_mktsegment, rid, 0 AS ver FROM lo
          UNION ALL
          SELECT c_custkey, c_mktsegment, rid, 1 AS ver FROM hi)
        SELECT c_custkey, CAST(rid AS BIGINT) AS _row_id,
               CAST(ver AS BIGINT) AS _row_commit_version
        FROM base WHERE c_mktsegment <> 'BUILDING'""")),

    // Merge-on-read UPDATE: matched rows shade in place and ONLY the
    // updated rows are rewritten (additive transform — lesson 22: stays
    // in the cross-engine-exact class). The require proves the shading
    // path actually ran (descriptors on the original files).
    QueryDef(
      "delta_dv_update",
      (s, dir) => {
        import s.implicits._
        val path = tmp("dvupdate")
        DeltaTable.write(t(s, dir, "customer"), path, SaveMode.Overwrite,
          configuration = Map("delta.enableDeletionVectors" -> "true"))
        val table = DeltaTable.forPath(s, path)
        table.update($"c_mktsegment" === "BUILDING",
          Map("c_acctbal" -> ($"c_acctbal" + lit(100.0))))
        require(graft.delta.DeltaLog.forTable(s, path).update().allFiles
          .exists(_.deletionVector.isDefined),
          "UPDATE on a DV table must shade, not rewrite")
        table.toDF
          .groupBy($"c_nationkey")
          .agg(count(lit(1)).as("n"),
               sum($"c_acctbal".cast(DecimalType(12, 2))).cast("double")
                 .as("sum_bal"))
      },
      Some("""
        SELECT c_nationkey, COUNT(*) AS n,
               CAST(SUM(CAST(CASE WHEN c_mktsegment = 'BUILDING'
                                  THEN c_acctbal + 100.0
                                  ELSE c_acctbal END AS DECIMAL(12,2)))
                    AS DOUBLE) AS sum_bal
        FROM customer
        GROUP BY c_nationkey""")),

    // Merge-on-read MERGE: one statement carrying a conditional DELETE
    // clause, an UPDATE clause and an INSERT clause against a DV-enabled
    // target — hit rows shade, updated+inserted rows are the only new
    // data. The oracle replays the three clauses as plain SQL.
    QueryDef(
      "delta_dv_merge",
      (s, dir) => {
        import s.implicits._
        val path = tmp("dvmerge")
        val base = t(s, dir, "customer")
        DeltaTable.write(base, path, SaveMode.Overwrite,
          configuration = Map("delta.enableDeletionVectors" -> "true"))
        val table = DeltaTable.forPath(s, path)
        val src = base.filter($"c_custkey" % 10 === 1 || $"c_custkey" % 10 === 3)
          .select($"c_custkey".as("k"))
          .unionByName(base.filter($"c_custkey" % 10 === 1)
            .select(($"c_custkey" + 10000000L).as("k")))
        table.merge(src, col("t.c_custkey") === col("s.k"))
          .whenMatchedDelete(col("s.k") % 10 === 1)
          .whenMatchedUpdate(Map("c_mktsegment" -> lit("UPDATED")))
          .whenNotMatchedInsert(Map(
            "c_custkey" -> col("s.k"), "c_mktsegment" -> lit("NEW")))
          .execute()
        require(graft.delta.DeltaLog.forTable(s, path).update().allFiles
          .exists(_.deletionVector.isDefined),
          "MERGE on a DV table must shade, not rewrite")
        table.toDF
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n"),
               sum($"c_custkey").as("sum_key"))
      },
      Some("""
        WITH merged AS (
          SELECT CASE WHEN c_custkey % 10 = 3 THEN 'UPDATED'
                      ELSE c_mktsegment END AS c_mktsegment,
                 c_custkey
          FROM customer
          WHERE c_custkey % 10 <> 1
          UNION ALL
          SELECT 'NEW' AS c_mktsegment, c_custkey + 10000000 AS c_custkey
          FROM customer
          WHERE c_custkey % 10 = 1
        )
        SELECT c_mktsegment, COUNT(*) AS n,
               CAST(SUM(c_custkey) AS BIGINT) AS sum_key
        FROM merged
        GROUP BY c_mktsegment"""))
  )
}
