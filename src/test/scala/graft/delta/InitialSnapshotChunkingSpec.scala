package graft.delta

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Initial-snapshot chunking in the streaming source (VERDICT r13 #1).
  *
  * A no-startingVersion stream's first batch used to be the WHOLE
  * initial snapshot — executor-bounded but one giant micro-batch at
  * 100 TB (latency/retry cost). It now drains in budget-bounded chunks
  * over a stable sort-by-path cursor, with `snapshot`-flagged offsets in
  * the engine's offset log, resuming mid-snapshot across restarts
  * (reference semantics: SnapshotProcessor.java:53-62 +
  * DeltaFileEnumerator.java:53-80 track per-file processedPaths; here
  * the offset is a rank in the deterministic path order, O(1) state).
  *
  * FileCountScaleSpec pins the same machinery at 100k files; this spec
  * drives the REAL micro-batch engine end to end. */
class InitialSnapshotChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot offsets: JSON round-trip, legacy forms parse unchanged, " +
      "ordering puts the drain below same-version commit-walk offsets") {
    import graft.delta.streaming.DeltaSourceOffset
    val snap = DeltaSourceOffset(7L, 300L, isSnapshot = true)
    assert(snap.json == """{"version":7,"index":300,"snapshot":true}""")
    assert(DeltaSourceOffset.parse(snap.json) == snap)
    // legacy forms: bare version and sub-version — byte-identical parses
    assert(DeltaSourceOffset.parse("7") == DeltaSourceOffset.boundary(7L))
    assert(DeltaSourceOffset.parse("""{"version":7,"index":300}""") ==
      DeltaSourceOffset(7L, 300L))
    // a snapshot offset is BELOW every same-version commit-walk offset
    // (the drain of snapshot-at-7 completes before 7's boundary)
    assert(snap <= DeltaSourceOffset.boundary(7L))
    assert(!(DeltaSourceOffset.boundary(7L) <= snap))
    assert(snap <= DeltaSourceOffset(7L, 0L))
    assert(snap <= DeltaSourceOffset(7L, 301L, isSnapshot = true))
    assert(!(snap <= DeltaSourceOffset(7L, 299L, isSnapshot = true)))
    assert(snap <= DeltaSourceOffset(8L, 0L, isSnapshot = true))
  }

  test("the engine drains a chunked initial snapshot, survives a restart " +
      "mid-snapshot, then hands over to the commit walk — exactly once") {
    withTempDir { base =>
      val table = s"$base/table"
      val out = s"$base/out"
      val ckpt = s"$base/ckpt"
      // 12 files of 5 rows each in the initial snapshot
      DeltaTable.write((1 to 60).toDF("value").repartition(12), table)
      def start() = spark.readStream.format("graft-delta")
        .option("maxFilesPerTrigger", "5")
        .load(table)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(Trigger.AvailableNow())
        .start()

      // first run: stop once at least one batch committed, so recovery
      // resumes from a MID-SNAPSHOT offset
      val q1 = start()
      val deadline = System.currentTimeMillis() + 60000
      while (q1.isActive && q1.recentProgress.length < 1 &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(50)
      }
      q1.stop()
      q1.awaitTermination(60000)

      // second run: drain to completion from the recovered offset
      val q2 = start()
      q2.awaitTermination(120000)

      // the offset log persisted snapshot-flagged offsets mid-drain
      val fs = new org.apache.hadoop.fs.Path(ckpt)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val offsetBodies = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$ckpt/offsets")).toSeq
        .map { st =>
          val in = fs.open(st.getPath)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        }
      assert(offsetBodies.exists(_.contains("\"snapshot\":true")),
        "the engine never persisted a snapshot offset — the initial " +
          "snapshot was not chunked")

      // exactly-once across the restart
      val got = spark.read.parquet(out).as[Int].collect().sorted.toSeq
      assert(got == (1 to 60).toSeq,
        s"restart lost or duplicated rows: ${got.size} rows")

      // handover: a commit AFTER the drain flows through the commit walk
      // from the same checkpoint
      DeltaTable.write((61 to 70).toDF("value"), table)
      val q3 = start()
      q3.awaitTermination(120000)
      val all = spark.read.parquet(out).as[Int].collect().sorted.toSeq
      assert(all == (1 to 70).toSeq,
        s"commit-walk handover lost rows: ${all.size} rows")
    }
  }

  test("per-batch admission holds during the drain (each micro-batch " +
      "carries at most budget x rows-per-file rows) and small snapshots " +
      "keep the single-batch fast path") {
    withTempDir { base =>
      val table = s"$base/table"
      DeltaTable.write((1 to 60).toDF("value").repartition(12), table)
      val q = spark.readStream.format("graft-delta")
        .option("maxFilesPerTrigger", "5")
        .load(table)
        .writeStream.format("memory").queryName("snapdrain")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val progressed = q.recentProgress.filter(_.numInputRows > 0)
      assert(progressed.length >= 3,
        s"12 files at budget 5 must take >=3 batches: ${progressed.length}")
      // ~5 rows per file (round-robin repartition can be off by one)
      // x 5-file budget
      progressed.foreach(p => assert(p.numInputRows <= 30,
        s"a drain batch admitted ${p.numInputRows} rows"))
      assert(spark.table("snapdrain").as[Int].collect().sorted.toSeq ==
        (1 to 60).toSeq)

      // a snapshot within budget serves as ONE batch (legacy fast path,
      // no cursor built)
      val table2 = s"$base/small"
      DeltaTable.write((1 to 60).toDF("value").repartition(12), table2)
      val q2 = spark.readStream.format("graft-delta")
        .option("maxFilesPerTrigger", "100")
        .load(table2)
        .writeStream.format("memory").queryName("snapwhole")
        .trigger(Trigger.AvailableNow())
        .start()
      q2.awaitTermination(60000)
      assert(q2.recentProgress.count(_.numInputRows > 0) == 1,
        "a within-budget snapshot must stay a single batch")
      assert(spark.table("snapwhole").count() == 60)
    }
  }

  test("a chunked initial-snapshot drain over a DV-shaded table does not " +
      "resurrect deleted rows in any slice") {
    withTempDir { base =>
      val table = s"$base/table"
      DeltaTable.write((1 to 60).toDF("value").repartition(12), table,
        configuration = Map("delta.enableDeletionVectors" -> "true"))
      // shade every file with a deletion vector (multiples of 3 die);
      // each drain slice must apply its files' DV anti-filter
      DeltaTable.forPath(spark, table).delete($"value" % 3 === 0)
      val q = spark.readStream.format("graft-delta")
        .option("maxFilesPerTrigger", "5")
        .load(table)
        .writeStream.format("memory").queryName("dvdrain")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        "the DV snapshot must still chunk")
      val got = spark.table("dvdrain").as[Int].collect().sorted.toSeq
      assert(got == (1 to 60).filter(_ % 3 != 0).toSeq,
        s"DV-deleted rows resurrected or lost in the drain: ${got.size}")
    }
  }

  test("CDF stream chunks its initial snapshot as insert slices at the " +
      "pinned version") {
    withTempDir { base =>
      val table = s"$base/table"
      DeltaTable.write((1 to 60).toDF("value").repartition(12), table,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      val pinned = DeltaLog.forTable(spark, table).update().version
      val q = spark.readStream.format("graft-delta")
        .option("readChangeFeed", "true")
        .option("maxFilesPerTrigger", "5")
        .load(table)
        .writeStream.format("memory").queryName("cdfdrain")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        "the CDF initial snapshot must chunk")
      val rows = spark.table("cdfdrain")
        .select("value", "_change_type", "_commit_version")
        .as[(Int, String, Long)].collect()
      assert(rows.map(_._1).sorted.toSeq == (1 to 60).toSeq)
      assert(rows.forall(r => r._2 == "insert" && r._3 == pinned),
        "every drain row must be an insert at the pinned version")
    }
  }
}
