package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChangeDataFeedSpec extends SparkSpec {
  import spark.implicits._

  test("batch readChangeFeed via the DataFrame reader") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "a")).toDF("id", "v"), dir,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      DeltaTable.write(Seq((2, "b")).toDF("id", "v"), dir)
      DeltaTable.forPath(spark, dir).delete($"id" === 1)

      val all = spark.read.format("graft-delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load(dir)
        .select($"id", col(write.CdcWriter.ChangeTypeCol), $"_commit_version")
        .as[(Int, String, Long)].collect().toSet
      assert(all == Set((1, "insert", 0L), (2, "insert", 1L),
        (1, "delete", 2L)), all.toString)

      val bounded = spark.read.format("graft-delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .option("endingVersion", "1")
        .load(dir)
        .select($"id").as[Int].collect().toSeq
      assert(bounded == Seq(2))

      intercept[IllegalArgumentException] {
        spark.read.format("graft-delta")
          .option("readChangeFeed", "true").load(dir).collect()
      }

      // timestamp bounds resolve through the commit timeline
      val log = DeltaLog.forTable(spark, dir)
      val t1 = new java.sql.Timestamp(
        log.getSnapshotForVersionAsOf(1).timestamp).toString
      val byTs = spark.read.format("graft-delta")
        .option("readChangeFeed", "true")
        .option("startingTimestamp", t1)
        .option("endingTimestamp", t1)
        .load(dir)
        .select($"id").as[Int].collect().toSeq
      assert(byTs == Seq(2))
    }
  }
  import spark.implicits._

  private val cdf = Map("delta.enableChangeDataFeed" -> "true")

  test("a mid-range gap (cleaned or compacted-away commit) fails the " +
      "feed loudly; the raw iterator can opt out") {
    withTempDir { dir =>
      DeltaTable.write((1 to 4).map(i => (i, i * 1.0)).toDF("id", "v"), dir,
        configuration = cdf)
      (1 to 3).foreach(i =>
        DeltaTable.write(Seq((10 + i, i * 1.0)).toDF("id", "v"), dir))
      val log = DeltaLog.forTable(spark, dir)
      // snapshot assembly stays healthy (reads from this checkpoint) —
      // only the CHANGE range crosses the hole
      Checkpoints.writeCheckpoint(log.update())
      DeltaTable.write(Seq((99, 9.0)).toDF("id", "v"), dir) // v4
      // simulate a compaction-then-cleanup hole: v2's json vanishes
      assert(new java.io.File(
        FileNames.deltaFile(log.logPath, 2).toUri.getPath).delete())
      val e = intercept[IllegalStateException] {
        DeltaTable.forPath(spark, dir).changes(1, 4).collect()
      }
      assert(e.getMessage.contains("missing from the log"), e.getMessage)
      // head truncation keeps its own message
      val e2 = intercept[IllegalStateException] {
        log.getChanges(2, failOnDataLoss = true).toVector
      }
      assert(e2.getMessage.contains("log truncated"), e2.getMessage)
      // a range that never touches the hole stays servable — the check
      // is bounded to the REQUESTED range, not the whole log tail
      assert(DeltaTable.forPath(spark, dir).changes(3, 4).count() > 0)
      assert(DeltaTable.forPath(spark, dir).changes(1, 1).count() > 0)
      // past-head start is "nothing there yet", not data loss
      assert(log.getChanges(9, failOnDataLoss = true).isEmpty)
      // explicit opt-out skips the hole (the streaming option's contract)
      val vs = log.getChanges(1, failOnDataLoss = false)
        .map(_._1).toVector
      assert(vs == Vector(1L, 3L, 4L))
      // an ALL-GONE range fails loudly too (the empty listing previously
      // bypassed every check): checkpoint pins the head at 4, then burn
      // v4's json — the version still EXISTS, its changes do not
      Checkpoints.writeCheckpoint(log.update())
      assert(new java.io.File(
        FileNames.deltaFile(log.logPath, 4).toUri.getPath).delete())
      val e3 = intercept[IllegalStateException] {
        log.getChanges(4, failOnDataLoss = true).toVector
      }
      assert(e3.getMessage.contains("no commit files remain"), e3.getMessage)
      // and a trailing gap inside an explicit bound: [3, 4] with 4 gone
      val e4 = intercept[IllegalStateException] {
        log.getChanges(3, failOnDataLoss = true, Some(4L)).toVector
      }
      assert(e4.getMessage.contains("missing from the log"), e4.getMessage)
    }
  }

  test("FOREIGN-shaped cdc files stitch partition values from the log " +
      "(partition columns not in the parquet data)") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "x"), (2, "y")).toDF("id", "p"), dir,
        partitionBy = Seq("p"), configuration = cdf)
      // delta-spark partitions the change parquet and keeps 'p' OUT of
      // the data; the value rides AddCDCFile.partitionValues
      val cdcDf = Seq((7, "insert"), (8, "insert"))
        .toDF("id", graft.delta.write.CdcWriter.ChangeTypeCol)
      val stage = s"$dir/.cdcstage"
      cdcDf.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val destRel = "_change_data/p=x/foreign-cdc.parquet"
      val dest = new java.io.File(dir, destRel)
      dest.getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath, dest.toPath)

      val log = DeltaLog.forTable(spark, dir)
      val v = log.startTransaction().commit(
        Seq(AddCDCFile(path = destRel,
          partitionValues = Map("p" -> "x"), size = dest.length())),
        "MANUAL_CDC")
      val rows = DeltaTable.forPath(spark, dir).changes(v, v)
        .select($"id", $"p", col("_change_type"))
        .as[(Int, String, String)].collect().toSet
      assert(rows == Set((7, "x", "insert"), (8, "x", "insert")),
        s"partition values must stitch from the log, got $rows")
    }
  }

  test("a derived delete from a RemoveFile WITHOUT size still emits its " +
      "rows (no zero-split silent drop)") {
    withTempDir { dir =>
      DeltaTable.write((1 to 6).toDF("id").coalesce(1), dir,
        configuration = cdf)
      val log = DeltaLog.forTable(spark, dir)
      val victim = log.update().allFiles.head
      val v = log.startTransaction().commit(
        Seq(RemoveFile(victim.path, Some(1L), dataChange = true,
          partitionValues = Some(Map.empty), size = None)),
        "MANUAL_DELETE")
      val deletes = DeltaTable.forPath(spark, dir).changes(v, v)
        .filter(col("_change_type") === "delete")
      assert(deletes.count() == 6,
        "size-less remove must still read its file for derived deletes")
    }
  }

  test("inserts, updates and deletes all appear in the change feed") {
    withTempDir { dir =>
      DeltaTable.write((1 to 4).map(i => (i, i * 1.0)).toDF("id", "v"), dir,
        configuration = cdf)                                   // v0: insert x4
      DeltaTable.write(Seq((5, 5.0)).toDF("id", "v"), dir)     // v1: insert x1
      val table = DeltaTable.forPath(spark, dir)
      table.update($"id" === 2, Map("v" -> lit(-2.0)))         // v2: pre+post
      table.delete($"v" > 4.0)                                 // v3: delete id 5

      val feed = table.changes(0, 3)
        .select($"id", $"v", col("_change_type"), col("_commit_version"))
        .as[(Int, Double, String, Long)].collect().toSet
      assert(feed.count(_._3 == "insert") == 5)
      assert(feed.contains((2, 2.0, "update_preimage", 2L)))
      assert(feed.contains((2, -2.0, "update_postimage", 2L)))
      assert(feed.contains((5, 5.0, "delete", 3L)))
      // windowed read
      assert(table.changes(2, 2).count() == 2)
    }
  }

  test("metadata-only partition delete derives full-row deletes") {
    withTempDir { dir =>
      DeltaTable.write((1 to 10).map(i => (i, s"g${i % 2}")).toDF("v", "grp"),
        dir, partitionBy = Seq("grp"), configuration = cdf)
      val table = DeltaTable.forPath(spark, dir)
      table.deleteWhere($"grp" === "g0") // v1, no files rewritten
      val deleted = table.changes(1, 1)
        .filter(col("_change_type") === "delete")
        .select($"v").as[Int].collect().sorted.toSeq
      assert(deleted == Seq(2, 4, 6, 8, 10))
    }
  }

  test("merge records update, delete and insert changes") {
    withTempDir { dir =>
      DeltaTable.write((1 to 5).map(i => (i, i * 10.0)).toDF("id", "p"), dir,
        configuration = cdf)
      val table = DeltaTable.forPath(spark, dir)
      table.merge((4 to 7).map(i => (i, i * 100.0)).toDF("id", "p"),
          col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("p" -> col("s.p")))
        .whenNotMatchedInsertAll()
        .execute() // v1
      val feed = table.changes(1, 1)
        .select($"id", $"p", col("_change_type"))
        .as[(Int, Double, String)].collect().toSet
      assert(feed.contains((4, 40.0, "update_preimage")))
      assert(feed.contains((4, 400.0, "update_postimage")))
      assert(feed.contains((5, 50.0, "update_preimage")))
      assert(feed.contains((6, 600.0, "insert")))
      assert(feed.contains((7, 700.0, "insert")))
    }
  }

  test("streaming readChangeFeed emits typed changes per micro-batch") {
    withTempDir { base =>
      val dir = s"$base/table"
      DeltaTable.write((1 to 3).map(i => (i, i * 1.0)).toDF("id", "v"), dir,
        configuration = cdf)                                  // v0
      val table = DeltaTable.forPath(spark, dir)
      table.update($"id" === 1, Map("v" -> lit(-1.0)))        // v1
      table.delete($"v" > 2.5)                                // v2 (deletes id 3)

      val q = spark.readStream.format("graft-delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load(dir)
        .writeStream.format("memory").queryName("cdf_stream")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      val feed = spark.table("cdf_stream")
        .select($"id", $"v", col("_change_type"), col("_commit_version"))
        .as[(Int, Double, String, Long)].collect().toSet
      assert(feed.count(_._3 == "insert") == 3)
      assert(feed.contains((1, 1.0, "update_preimage", 1L)))
      assert(feed.contains((1, -1.0, "update_postimage", 1L)))
      assert(feed.contains((3, 3.0, "delete", 2L)))

      // appends after the stream started flow as inserts
      DeltaTable.write(Seq((9, 9.0)).toDF("id", "v"), dir)    // v3
      val q2 = spark.readStream.format("graft-delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "3")
        .load(dir)
        .writeStream.format("memory").queryName("cdf_stream2")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q2.awaitTermination(120000)
      assert(spark.table("cdf_stream2")
        .select($"id", col("_change_type")).as[(Int, String)].collect().toSet ==
        Set((9, "insert")))
    }
  }

  test("a DML version with several cdc files chunks through the CDF " +
      "stream by cdc-file index (VERDICT r13 #3) — union equals the " +
      "batch CDF read") {
    withTempDir { base =>
      val dir = s"$base/table"
      // 3 partitions so the UPDATE writes (at least) one cdc file per
      // partition — a single DML version with multiple AddCDCFiles
      DeltaTable.write(
        (1 to 9).map(i => (i, i % 3, i * 1.0)).toDF("id", "p", "v"), dir,
        partitionBy = Seq("p"), configuration = cdf)          // v0
      val table = DeltaTable.forPath(spark, dir)
      table.update($"id" > 0, Map("v" -> ($"v" * 10)))        // v1: all rows
      val log = DeltaLog.forTable(spark, dir)
      val cdcCount = log.getChanges(1L).next()._2
        .count(_.isInstanceOf[AddCDCFile])
      assert(cdcCount >= 2, s"setup needs >=2 cdc files, got $cdcCount")

      val q = spark.readStream.format("graft-delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .option("maxFilesPerTrigger", "1")
        .load(dir)
        .writeStream.format("memory").queryName("cdc_chunked")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      // one cdc file per micro-batch
      assert(q.recentProgress.count(_.numInputRows > 0) >= cdcCount,
        s"a $cdcCount-cdc-file version must drain as >=$cdcCount batches")
      val streamed = spark.table("cdc_chunked")
        .select($"id", $"v", col("_change_type"), col("_commit_version"))
        .as[(Int, Double, String, Long)].collect()
      assert(streamed.length == streamed.distinct.length,
        "chunked drain duplicated change rows")
      val batch = spark.read.format("graft-delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1").option("endingVersion", "1")
        .load(dir)
        .select($"id", $"v", col("_change_type"), col("_commit_version"))
        .as[(Int, Double, String, Long)].collect()
      assert(streamed.toSet == batch.toSet,
        "chunked CDF stream diverged from the batch CDF read")
    }
  }

  test("a delete-only version (removes, no change files) chunks through " +
      "the CDF stream by remove index — union equals the batch CDF read") {
    withTempDir { base =>
      val dir = s"$base/table"
      // 3 partitions; a whole-partition delete is metadata-only: one
      // version with one RemoveFile per partition file and NO cdc files
      DeltaTable.write(
        (1 to 9).map(i => (i, i % 3, i * 1.0)).toDF("id", "p", "v"), dir,
        partitionBy = Seq("p"), configuration = cdf)          // v0
      DeltaTable.forPath(spark, dir).delete($"p" >= 0)        // v1: all
      val log = DeltaLog.forTable(spark, dir)
      val acts = log.getChanges(1L).next()._2
      val rmCount = acts.count {
        case r: RemoveFile => r.dataChange
        case _ => false
      }
      assert(rmCount >= 2 && !acts.exists(_.isInstanceOf[AddCDCFile]),
        s"setup needs a delete-only version with >=2 removes: $acts")

      val q = spark.readStream.format("graft-delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .option("maxFilesPerTrigger", "1")
        .load(dir)
        .writeStream.format("memory").queryName("rm_chunked")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(q.recentProgress.count(_.numInputRows > 0) >= rmCount,
        s"a $rmCount-remove version must drain as >=$rmCount batches")
      val streamed = spark.table("rm_chunked")
        .select($"id", $"v", col("_change_type"), col("_commit_version"))
        .as[(Int, Double, String, Long)].collect()
      assert(streamed.length == streamed.distinct.length,
        "chunked drain duplicated delete rows")
      val batch = spark.read.format("graft-delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1").option("endingVersion", "1")
        .load(dir)
        .select($"id", $"v", col("_change_type"), col("_commit_version"))
        .as[(Int, Double, String, Long)].collect()
      assert(streamed.toSet == batch.toSet,
        "chunked delete-only CDF stream diverged from the batch read")
      assert(streamed.forall(_._3 == "delete"))
    }
  }

  test("a wide version range plans at most two scan relations") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "a")).toDF("id", "v"), dir,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      (2 to 40).foreach(i => DeltaTable.write(Seq((i, s"v$i")).toDF("id", "v"), dir))
      DeltaTable.forPath(spark, dir).delete($"id" === 3) // one rewrite commit
      val table = DeltaTable.forPath(spark, dir)
      val endV = table.deltaLog.update().version
      val df = table.changes(0, endV)
      // one relation over the change parquet + one over derived files —
      // NOT one per version (O(versions) plan nodes kill wide backfills)
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.size <= 2, s"CDF range read planned ${scans.size} scans")
      // content is intact: 40 inserts + delete pre-rows
      val byType = df.groupBy($"_change_type").count()
        .as[(String, Long)].collect().toMap
      assert(byType("insert") == 40, byType.toString)
      assert(byType("delete") == 1, byType.toString)
      // _commit_version attaches per file and is filterable
      assert(df.filter($"_commit_version" === 1).count() == 1)
      val versions = df.select($"_commit_version").distinct().count()
      assert(versions == endV + 1, s"$versions distinct versions")
    }
  }

  test("rewrite commits without change files refuse a CDF read") {
    withTempDir { dir =>
      DeltaTable.write((1 to 10).map(i => (i, i * 1.0)).toDF("id", "v"), dir)
      val table = DeltaTable.forPath(spark, dir)
      table.delete($"id" > 8) // rewrite without CDC (feed disabled)
      intercept[UnsupportedOperationException] {
        table.changes(0, table.version).collect()
      }
      // plain insert ranges still readable
      assert(table.changes(0, 0).count() == 10)
    }
  }
}
