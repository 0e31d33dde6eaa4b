package graft.delta

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  /** Files selected by the plan's parquet scan after pruning + skipping. */
  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }
    scan.map(s => s.relation.location
      .listFiles(s.partitionFilters, s.dataFilters)
      .map(_.files.length.toLong).sum).getOrElse(-1L)
  }

  test("dataSkippingNumIndexedCols bounds the stats width") {
    withTempDir { dir =>
      val wide = spark.range(0, 50).toDF("c0")
      val df = (1 until 40).foldLeft(wide)((d, i) => d.withColumn(s"c$i", $"c0" + i))
      DeltaTable.write(df, dir,
        configuration = Map("delta.dataSkippingNumIndexedCols" -> "4"))
      val stats = DeltaLog.forTable(spark, dir).update().allFiles.head.stats.get
      val node = JsonCodec.mapper.readTree(stats)
      assert(node.get("numRecords").asLong > 0) // always collected
      val mins = node.get("minValues")
      assert(mins.has("c0") && mins.has("c3") && !mins.has("c4"),
        s"stats width not bounded: $stats")
      // skipping still prunes on an indexed column…
      assert(filesRead(DeltaTable.forPath(spark, dir).toDF
        .filter($"c0" === -1L)) == 0L)
      // …and stays conservative (keeps files) on an unindexed one
      assert(DeltaTable.forPath(spark, dir).toDF
        .filter($"c39" === 39L).count() == 1L)
    }
  }

  test("dataSkippingStatsColumns replaces the positional rule") {
    withTempDir { dir =>
      val wide = spark.range(0, 50).toDF("c0")
      val df = (1 until 40).foldLeft(wide)((d, i) => d.withColumn(s"c$i", $"c0" + i))
      // only a LATE column is declared: it must carry stats even though
      // it sits past any positional cutoff, and early columns must not
      DeltaTable.write(df, dir,
        configuration = Map("delta.dataSkippingStatsColumns" -> "c38"))
      val stats = DeltaLog.forTable(spark, dir).update().allFiles.head.stats.get
      val node = JsonCodec.mapper.readTree(stats)
      assert(node.get("numRecords").asLong > 0)
      val mins = node.get("minValues")
      assert(mins.has("c38") && !mins.has("c0") && !mins.has("c1"),
        s"explicit list not honored: $stats")
      // pruning bites on the declared column (impossible predicate → 0
      // files), stays conservative on undeclared ones
      assert(filesRead(DeltaTable.forPath(spark, dir).toDF
        .filter($"c38" === -1L)) == 0L)
      assert(DeltaTable.forPath(spark, dir).toDF
        .filter($"c0" === 7L).count() == 1L)
    }
  }

  test("dataSkippingStatsColumns matches case-insensitively and refuses " +
      "unknown names") {
    withTempDir { dir =>
      // case-mangled entry still binds to the schema column
      DeltaTable.write(spark.range(0, 9).toDF("myCol").coalesce(1), dir,
        configuration = Map("delta.dataSkippingStatsColumns" -> "MYCOL"))
      val stats = DeltaLog.forTable(spark, dir).update().allFiles.head.stats.get
      assert(JsonCodec.mapper.readTree(stats).get("minValues").has("myCol"),
        s"case-insensitive match must index myCol: $stats")
    }
    withTempDir { dir =>
      // a typo'd entry fails LOUDLY instead of writing stat-less files
      val e = intercept[Exception] {
        DeltaTable.write(spark.range(0, 9).toDF("v").coalesce(1), dir,
          configuration = Map("delta.dataSkippingStatsColumns" -> "vv"))
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(e).exists(_.contains("vv")), s"must name the typo: $e")
    }
  }

  test("numIndexedCols above the old hard cap is honored") {
    withTempDir { dir =>
      val wide = spark.range(0, 10).toDF("c0")
      val df = (1 until 40).foldLeft(wide)((d, i) => d.withColumn(s"c$i", $"c0" + i))
      DeltaTable.write(df, dir,
        configuration = Map("delta.dataSkippingNumIndexedCols" -> "40"))
      val stats = DeltaLog.forTable(spark, dir).update().allFiles.head.stats.get
      val mins = JsonCodec.mapper.readTree(stats).get("minValues")
      assert(mins.has("c39"),
        s"raising numIndexedCols past 32 must widen stats: $stats")
    }
  }

  test("optimizeWrite coalesces confetti batches to few files") {
    withTempDir { dir =>
      // a 64-partition job writing ~100 KB would emit 64 tiny files
      val confetti = spark.range(0, 10000).toDF("id").repartition(64)
      DeltaTable.write(confetti, dir,
        configuration = Map("delta.autoOptimize.optimizeWrite" -> "true"))
      val n = DeltaLog.forTable(spark, dir).update().numOfFiles
      assert(n <= 2, s"optimizeWrite still produced $n files")
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 10000)

      // disabled (default): the job's partitioning dictates file count
      withTempDir { plain =>
        DeltaTable.write(confetti, plain)
        assert(DeltaLog.forTable(spark, plain).update().numOfFiles > 32)
      }
    }
  }

  test("writes populate AddFile.stats with numRecords and min/max") {
    withTempDir { dir =>
      DeltaTable.write(
        (1 to 100).map(i => (i, s"name$i", i * 1.0)).toDF("id", "name", "score"),
        dir)
      val files = DeltaLog.forTable(spark, dir).update().allFiles
      assert(files.forall(_.stats.isDefined))
      val total = files.flatMap(_.stats).map { s =>
        JsonCodec.mapper.readTree(s).get("numRecords").asLong
      }.sum
      assert(total == 100)
      val anyStats = JsonCodec.mapper.readTree(files.head.stats.get)
      assert(anyStats.get("minValues").has("id"))
      assert(anyStats.get("maxValues").has("name"))
      assert(anyStats.get("nullCount").has("score"))
    }
  }

  test("large commits collect stats through the distributed path") {
    withTempDir { dir =>
      // > StatsCollector.DriverStatsMaxFiles files in one commit → footer
      // reads run as a Spark job; stats must be indistinguishable
      val nFiles = write.StatsCollector.DriverStatsMaxFiles + 8
      DeltaTable.write(
        (1 to 1000).map(i => (i, i * 2.0)).toDF("id", "score")
          .repartition(nFiles),
        dir)
      val files = DeltaLog.forTable(spark, dir).update().allFiles
      assert(files.size == nFiles)
      assert(files.forall(_.stats.isDefined))
      val total = files.flatMap(_.stats).map { s =>
        JsonCodec.mapper.readTree(s).get("numRecords").asLong
      }.sum
      assert(total == 1000)
      val mins = files.flatMap(_.stats).map { s =>
        JsonCodec.mapper.readTree(s).get("minValues").get("id").asInt
      }
      assert(mins.min == 1)
    }
  }

  test("range predicate skips files whose min/max cannot match") {
    withTempDir { dir =>
      // 8 range-partitioned files over id → disjoint id ranges per file
      val df = spark.range(0, 8000).toDF("id")
        .withColumn("val", $"id" * 2)
        .repartitionByRange(8, $"id")
      DeltaTable.write(df, dir)
      val table = DeltaTable.forPath(spark, dir)
      assert(DeltaLog.forTable(spark, dir).update().allFiles.size == 8)

      val narrow = table.toDF.filter($"id" >= 7200L)
      assert(narrow.count() == 800)
      assert(filesRead(narrow) == 1, "range filter should touch one file")

      val all = table.toDF
      assert(filesRead(all) == 8)

      // equality off the range → zero files
      val none = table.toDF.filter($"id" === 99999L)
      assert(none.count() == 0)
      assert(filesRead(none) == 0)
    }
  }

  test("string and null predicates skip conservatively and correctly") {
    withTempDir { dir =>
      val rows = (0 until 1000).map { i =>
        val grp = ('a' + i / 250).toChar.toString // a,b,c,d
        (i, s"$grp-key$i", if (i % 500 == 0) null else s"v$i")
      }
      DeltaTable.write(
        rows.toDF("id", "key", "opt").repartitionByRange(4, $"key"), dir)
      val table = DeltaTable.forPath(spark, dir)

      val b = table.toDF.filter($"key".startsWith("b-"))
      assert(b.count() == 250)
      assert(filesRead(b) < 4, "prefix filter should skip non-b files")

      // correctness under skipping: filtered result equals full-scan filter
      val viaSkip = table.toDF.filter($"key" >= "c-").select("id")
        .as[Int].collect().sorted
      val full = rows.filter(_._2 >= "c-").map(_._1).sorted
      assert(viaSkip.toSeq == full.toSeq)

      // IS NULL keeps only files that actually contain nulls
      val nulls = table.toDF.filter($"opt".isNull)
      assert(nulls.count() == 2)
    }
  }

  test("date range predicates prune on date-typed min/max") {
    withTempDir { dir =>
      val df = spark.range(0, 365).toDF("d")
        .select(date_add(lit(java.sql.Date.valueOf("2023-01-01")), $"d".cast("int")).as("day"),
          ($"d" % 10).as("v"))
        .repartitionByRange(12, $"day")
      DeltaTable.write(df, dir)
      val q = DeltaTable.forPath(spark, dir).toDF
        .filter($"day" >= "2023-12-01")
      assert(q.count() == 31)
      assert(filesRead(q) <= 2, "December filter should read ~1 of 12 files")
    }
  }

  test("pruning a checkpointed table reads stats_parsed, not JSON") {
    withTempDir { dir =>
      val df = spark.range(0, 8000).toDF("id")
        .withColumn("val", $"id" * 2)
        .repartitionByRange(8, $"id")
      DeltaTable.write(df, dir)
      Checkpoints.writeCheckpoint(DeltaLog.forTable(spark, dir).update())
      DeltaLog.clearCache()
      val table = DeltaTable.forPath(spark, dir)
      val snap = table.deltaLog.update()
      // the state must come from the checkpoint (stats_parsed present)
      assert(snap.allFiles.forall(_.stats_parsed.isDefined),
        "checkpoint-sourced files must carry stats_parsed")
      val before = read.DataSkipping.statsJsonParses.get()
      val narrow = table.toDF.filter($"id" >= 7200L)
      assert(narrow.count() == 800)
      assert(filesRead(narrow) == 1, "range filter should touch one file")
      assert(read.DataSkipping.statsJsonParses.get() == before,
        "pruning a checkpointed table must not re-parse stats JSON")
    }
  }

  test("skipping never loses rows when stats are absent") {
    withTempDir { dir =>
      DeltaTable.write((1 to 50).toDF("x"), dir)
      // simulate a foreign writer with no stats: strip them via a rewrite
      val log = DeltaLog.forTable(spark, dir)
      val snapshot = log.update()
      val txn = log.startTransaction()
      val stripped = snapshot.allFiles.map(f =>
        f.copy(stats = None, dataChange = false))
      txn.commit(stripped, DeltaOperations.ManualUpdate)
      DeltaLog.clearCache()
      val q = DeltaTable.forPath(spark, dir).toDF.filter($"x" > 25)
      assert(q.count() == 25)
    }
  }
}
