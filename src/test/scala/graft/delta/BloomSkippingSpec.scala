package graft.delta

import org.apache.spark.sql.functions._

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.SparkSpec
import graft.delta.write.BloomFilters

/** Per-file Bloom filters: point-lookup skipping where min/max cannot
  * prune (every file's range covers the key space). */
class BloomSkippingSpec extends SparkSpec {
  import spark.implicits._

  /** Files the plan's parquet scan would open after pruning + skipping
    * (blooms included — the DeltaFileIndex path real reads go through). */
  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }
    scan.map(s => s.relation.location
      .listFiles(s.partitionFilters, s.dataFilters)
      .map(_.files.length.toLong).sum).getOrElse(-1L)
  }

  /** Keys deliberately UNSORTED across files: md5-style strings spread
    * over every file, so [min,max] of each file spans ~the whole space
    * and only the bloom can prune an equality probe. */
  private def writeHashKeyed(dir: String, nFiles: Int): Unit = {
    val df = spark.range(0, 400).toDF("id")
      .withColumn("key", md5(concat(lit("k"), $"id")))
      .withColumn("v", $"id" * 2)
      .repartition(nFiles) // round-robin: every file gets keys everywhere
    DeltaTable.write(df, dir,
      configuration = Map("delta.bloomFilter.columns" -> "key"))
  }

  test("equality probe opens only bloom-positive files") {
    withTempDir { dir =>
      writeHashKeyed(dir, 8)
      val table = DeltaTable.forPath(spark, dir)
      val files = table.deltaLog.update().allFiles
      assert(files.size == 8)
      assert(files.forall(_.tags.exists(_.contains("bloom.key"))))

      // every key must be found (no false negatives), and probes must
      // prune most files (false-positive rate at 64Kbit/50 keys ≈ 0)
      val keys = spark.range(0, 400).toDF("id")
        .select(md5(concat(lit("k"), $"id"))).as[String].collect()
      var totalOpened = 0L
      keys.take(20).foreach { k =>
        totalOpened += filesRead(table.toDF.filter($"key" === k))
        val got = table.toDF.filter($"key" === k).count()
        assert(got == 1L, s"key $k not found")
      }
      // 20 probes × 8 files = 160 without blooms; with them ~20
      assert(totalOpened < 40, s"opened $totalOpened files for 20 probes")

      // a key that does not exist prunes everything
      assert(filesRead(table.toDF.filter($"key" === "nonexistent")) == 0L)
      // IN over two real keys keeps only their files
      val in2 = filesRead(table.toDF.filter($"key".isin(keys(0), keys(1))))
      assert(in2 <= 4, s"IN probe kept $in2 files")
    }
  }

  test("PARTITIONED tables: filters key per-file, not per-basename (dynamic " +
      "partition tasks reuse part-00000 names across partition dirs)") {
    withTempDir { dir =>
      // 3 partitions x same task numbers: identical basenames in every
      // partition dir — a basename-keyed build would merge their filters
      val df = spark.range(0, 600).toDF("id")
        .withColumn("p", ($"id" % 3).cast("int"))
        .withColumn("key", md5(concat(lit("k"), $"id")))
        .repartition(2) // 2 tasks x 3 dynamic partitions = 6 files
      DeltaTable.write(df, dir, partitionBy = Seq("p"),
        configuration = Map(
          "delta.bloomFilter.columns" -> "KEY")) // case-insensitive resolve
      val table = DeltaTable.forPath(spark, dir)
      val files = table.deltaLog.update().allFiles
      assert(files.size == 6, s"expected 6 files, got ${files.size}")
      assert(files.count(f =>
        f.path.split('/').last.startsWith("part-00000")) == 3,
        "fixture must actually collide basenames across partition dirs")
      assert(files.forall(_.tags.exists(_.contains("bloom.key"))),
        "every file must carry its own filter")
      // every key found; probes bounded by partition pruning + blooms
      val keys = spark.range(0, 600).toDF("id")
        .select(md5(concat(lit("k"), $"id"))).as[String].collect()
      keys.take(12).foreach { k =>
        assert(table.toDF.filter($"key" === k).count() == 1L,
          s"key $k not found (a merged/mis-keyed filter would lose it)")
      }
      var opened = 0L
      keys.take(12).foreach(k =>
        opened += filesRead(table.toDF.filter($"key" === k)))
      // 12 probes x 6 files = 72 without per-file blooms; with them ~12
      assert(opened < 30, s"opened $opened files for 12 probes")
    }
  }

  test("long keys skip too, and non-indexed columns are unaffected") {
    withTempDir { dir =>
      val df = spark.range(0, 100).toDF("id")
        .withColumn("scrambled", pmod(($"id" * 2654435761L), lit(1000000007L)))
        .repartition(4)
      DeltaTable.write(df, dir,
        configuration = Map("delta.bloomFilter.columns" -> "scrambled"))
      val table = DeltaTable.forPath(spark, dir)
      val probe = table.toDF.limit(1).select($"scrambled").as[Long].head()
      val kept = filesRead(table.toDF.filter($"scrambled" === probe))
      assert(kept < 4, s"bloom did not prune: $kept")
      assert(table.toDF.filter($"scrambled" === probe).count() >= 1)
      // id is not indexed: equality on it keeps files by min/max only
      assert(filesRead(table.toDF.filter($"id" === 42L)) >= 1)
    }
  }

  test("no configuration -> no tags, no behavior change") {
    withTempDir { dir =>
      DeltaTable.write(spark.range(0, 10).toDF("id").repartition(2), dir)
      val files = DeltaTable.forPath(spark, dir).deltaLog.update().allFiles
      assert(files.forall(_.tags.isEmpty))
    }
  }

  test("filters survive OPTIMIZE (rewrites re-index)") {
    withTempDir { dir =>
      writeHashKeyed(dir, 6)
      val table = DeltaTable.forPath(spark, dir)
      table.compact()
      val files = table.deltaLog.update().allFiles
      assert(files.nonEmpty)
      assert(files.forall(_.tags.exists(_.contains("bloom.key"))),
        "compacted files lost their bloom filters")
      val k = spark.range(5, 6).toDF("id")
        .select(md5(concat(lit("k"), $"id"))).as[String].head()
      assert(table.toDF.filter($"key" === k).count() == 1L)
    }
  }

  test("bloom tags survive checkpoint replay") {
    withTempDir { dir =>
      // enough commits to cross a checkpoint boundary
      (0 until 4).foreach { i =>
        DeltaTable.write(
          spark.range(i * 10, i * 10 + 10).toDF("id")
            .withColumn("key", md5(concat(lit("k"), $"id"))),
          dir, configuration =
            Map("delta.bloomFilter.columns" -> "key",
              "delta.checkpointInterval" -> "2"))
      }
      DeltaLog.clearCache() // force replay from the checkpoint parquet
      val table = DeltaTable.forPath(spark, dir)
      val files = table.deltaLog.update().allFiles
      assert(files.forall(_.tags.exists(_.contains("bloom.key"))),
        "tags lost through checkpoint round-trip")
      val k = spark.range(5, 6).toDF("id")
        .select(md5(concat(lit("k"), $"id"))).as[String].head()
      assert(filesRead(table.toDF.filter($"key" === k)) < files.size)
      assert(table.toDF.filter($"key" === k).count() == 1L)
    }
  }

  test("blooms prune columns outside the indexed-stats width") {
    withTempDir { dir =>
      // stats only for c0; the bloom column c5 has NO min/max entry —
      // the bloom verdict must stand on its own
      val df = spark.range(0, 200).toDF("c0")
      val wide = (1 to 5).foldLeft(df)((d, i) =>
        d.withColumn(s"c$i", md5(concat(lit(s"x$i"), $"c0"))))
        .repartition(4)
      DeltaTable.write(wide, dir, configuration = Map(
        "delta.dataSkippingNumIndexedCols" -> "1",
        "delta.bloomFilter.columns" -> "c5"))
      val table = DeltaTable.forPath(spark, dir)
      val probe = table.toDF.limit(1).select($"c5").as[String].head()
      assert(filesRead(table.toDF.filter($"c5" === probe)) < 4)
      assert(table.toDF.filter($"c5" === probe).count() >= 1)
      assert(filesRead(table.toDF.filter($"c5" === "absent-key")) == 0)
    }
  }

  test("build and probe agree on the bit protocol") {
    val bits = 1024
    val pos = BloomFilters.positions("hello", bits)
    assert(pos.length == BloomFilters.NumHashes)
    assert(pos.forall(p => p >= 0 && p < bits))
    // a bitset with exactly those bits set answers true; missing any -> false
    val words = (bits + 63) / 64
    val bytes = new Array[Byte](words * 8)
    pos.foreach(p => bytes(p >>> 3) = (bytes(p >>> 3) | (1 << (p & 7))).toByte)
    val b64 = java.util.Base64.getEncoder.encodeToString(bytes)
    assert(BloomFilters.mightContain(b64, bits, "hello"))
    assert(!BloomFilters.mightContain(b64, bits, "other"))
  }
}
