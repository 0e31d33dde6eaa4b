package graft.delta

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Partition-filter derivation from generated-column sources
  * ([[read.GeneratedPartitionFilters]]): a filter on `ts` must prune the
  * partitions of `day GENERATED AS (CAST(ts AS DATE))` without the user
  * ever mentioning `day`. Tables here disable stats
  * (`delta.dataSkippingNumIndexedCols = 0`) so the only possible pruning
  * mechanism IS the derivation — a pass cannot ride on min/max skipping.
  */
class GeneratedPartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))

  private def selectedFiles(df: org.apache.spark.sql.DataFrame): Int = {
    val scan = scanOf(df)
    scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.files.length).sum
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def mkTable(dir: String, genExpr: String, dayType: DataType): Unit = {
    DeltaTable.create(spark, dir,
      StructType(Seq(
        StructField("id", LongType),
        StructField("ts", TimestampType),
        StructField("day", dayType))),
      partitionBy = Seq("day"),
      configuration = Map("delta.dataSkippingNumIndexedCols" -> "0"),
      generatedColumns = Map("day" -> genExpr))
    val rows = for (d <- 1 to 6; i <- 1 to 3)
      yield (d * 10L + i, ts(f"2026-01-0$d%d 0$i%d:00:00"))
    DeltaTable.write(rows.toDF("id", "ts").coalesce(1), dir)
  }

  test("ts range filter prunes CAST(ts AS DATE) partitions") {
    withTempDir { dir =>
      mkTable(dir, "CAST(ts AS DATE)", DateType)
      val table = DeltaTable.forPath(spark, dir)
      val all = selectedFiles(table.toDF)
      assert(all >= 6, s"expected >=6 partition files, got $all")

      val q = table.toDF.filter($"ts" >= lit(ts("2026-01-05 00:00:00")))
      assert(q.count() == 6) // days 5 and 6
      val sel = selectedFiles(q)
      assert(sel == all / 3, s"expected 2 of 6 days scanned, got $sel of $all")

      // strict < weakens to <= on the partition: day 3 must still scan
      val q2 = table.toDF.filter($"ts" < lit(ts("2026-01-03 02:00:00")))
      assert(q2.count() == 7) // days 1, 2 fully + day 3 first row
      assert(selectedFiles(q2) == all / 2, "expected days 1-3 scanned")

      // equality and IN derive equality / IN on the partition value
      val q3 = table.toDF.filter($"ts" === lit(ts("2026-01-02 01:00:00")))
      assert(q3.count() == 1)
      assert(selectedFiles(q3) == all / 6)
      val q4 = table.toDF.filter(
        $"ts".isin(ts("2026-01-01 01:00:00"), ts("2026-01-04 02:00:00")))
      assert(q4.count() == 2)
      assert(selectedFiles(q4) == all / 3)
    }
  }

  test("date_format and year generation shapes prune too") {
    withTempDir { dir =>
      mkTable(dir, "date_format(ts, 'yyyy-MM-dd')", StringType)
      val table = DeltaTable.forPath(spark, dir)
      val all = selectedFiles(table.toDF)
      val q = table.toDF.filter($"ts" >= lit(ts("2026-01-06 00:00:00")))
      assert(q.count() == 3)
      assert(selectedFiles(q) == all / 6, "one of six day strings scanned")
    }
    withTempDir { dir =>
      // year() collapses every row into one partition — a ts filter
      // derives year >= 2026, which keeps the single partition; an
      // out-of-range filter prunes everything
      mkTable(dir, "year(ts)", IntegerType)
      val table = DeltaTable.forPath(spark, dir)
      val q = table.toDF.filter($"ts" >= lit(ts("2027-06-01 00:00:00")))
      assert(q.count() == 0)
      assert(selectedFiles(q) == 0, "year(ts) >= 2027 must prune all files")
    }
  }

  test("date_trunc generation (timestamp-typed partition) prunes") {
    withTempDir { dir =>
      mkTable(dir, "date_trunc('DAY', ts)", TimestampType)
      val table = DeltaTable.forPath(spark, dir)
      val all = selectedFiles(table.toDF)
      val q = table.toDF.filter($"ts" >= lit(ts("2026-01-05 00:00:00")))
      assert(q.count() == 6)
      assert(selectedFiles(q) == all / 3, "days 5 and 6 only")
    }
  }

  test("STRING-typed generation source derives nothing (order mismatch)") {
    withTempDir { dir =>
      // `src >= '2024-02-1'` compares LEXICOGRAPHICALLY ('2024-1-30' has
      // '1' > '0' at position 5, so it MATCHES) while a derived
      // `day >= 2024-02-01` would prune that row's file — the two orders
      // disagree, so the derivation must not fire for string sources
      DeltaTable.create(spark, dir,
        StructType(Seq(
          StructField("id", LongType),
          StructField("src", StringType),
          StructField("day", DateType))),
        partitionBy = Seq("day"),
        configuration = Map("delta.dataSkippingNumIndexedCols" -> "0"),
        generatedColumns = Map("day" -> "CAST(src AS DATE)"))
      DeltaTable.write(
        Seq((1L, "2024-1-30"), (2L, "2024-02-05")).toDF("id", "src")
          .coalesce(1), dir)
      val table = DeltaTable.forPath(spark, dir)
      val all = selectedFiles(table.toDF)
      assert(all == 2, s"expected a file per day partition, got $all")
      // lexicographically ONLY '2024-1-30' matches ('1' > '0' at pos 5,
      // while '2024-02-05' < '2024-02-1' at pos 8) — and that row lives
      // in day=2024-01-30, exactly the file a derived `day >= 2024-02-01`
      // would prune. A derivation here returns 0 rows; the right answer is 1.
      val q = table.toDF.filter($"src" >= "2024-02-1")
      assert(q.count() == 1,
        "the one lexicographically-matching row sits in the January partition")
      assert(selectedFiles(q) == all,
        "string-typed source must not derive a partition filter")
    }
  }

  test("non-monotonic or unparseable generations derive nothing (sound)") {
    withTempDir { dir =>
      mkTable(dir, "month(ts)", IntegerType)
      val table = DeltaTable.forPath(spark, dir)
      val all = selectedFiles(table.toDF)
      val q = table.toDF.filter($"ts" >= lit(ts("2026-01-05 00:00:00")))
      assert(q.count() == 6) // correctness unchanged
      assert(selectedFiles(q) == all, "month() must not derive a filter")
    }
  }

  test("the scan API's getFiles prunes on derived filters too") {
    withTempDir { dir =>
      mkTable(dir, "CAST(ts AS DATE)", DateType)
      val table = DeltaTable.forPath(spark, dir)
      val all = table.scan(lit(true)).getFiles.size
      val pruned = table.scan($"ts" >= lit(ts("2026-01-05 00:00:00"))).getFiles
      assert(pruned.size == all / 3, s"expected 2 of 6 days, got ${pruned.size}")
      assert(pruned.forall(_.partitionValues("day") >= "2026-01-05"))
    }
  }

  test("DELETE on the generation source leaves other partitions' files in place") {
    withTempDir { dir =>
      mkTable(dir, "CAST(ts AS DATE)", DateType)
      val log = DeltaLog.forTable(spark, dir)
      // `ts < midnight(01-03)` weakens to `day <= 01-03` (the derivation
      // cannot know the literal sits exactly on a day boundary), so day 3
      // is a legitimate rewrite candidate — days >= 04 must survive
      val before = log.update().allFiles
        .filter(_.partitionValues("day") >= "2026-01-04").map(_.path).toSet
      assert(before.nonEmpty)

      DeltaTable.forPath(spark, dir).delete($"ts" < lit(ts("2026-01-03 00:00:00")))

      val after = log.update().allFiles.map(_.path).toSet
      assert(before.subsetOf(after),
        "files of days >= 2026-01-04 must not be rewritten by the delete")
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 12)
    }
  }

  test("a merge condition on the source prunes merge candidates") {
    withTempDir { dir =>
      mkTable(dir, "CAST(ts AS DATE)", DateType)
      val log = DeltaLog.forTable(spark, dir)
      val untouched = log.update().allFiles
        .filter(_.partitionValues("day") != "2026-01-02").map(_.path).toSet

      val source = Seq((21L, ts("2026-01-02 01:00:00"), 999L))
        .toDF("sid", "sts", "newid")
      DeltaTable.forPath(spark, dir).merge(source,
          expr("t.id = s.sid AND t.ts >= timestamp'2026-01-02 00:00:00' " +
               "AND t.ts < timestamp'2026-01-03 00:00:00'"))
        .whenMatchedUpdate(Map("id" -> col("s.newid")))
        .execute()

      val after = log.update().allFiles.map(_.path).toSet
      assert(untouched.subsetOf(after),
        "merge must only rewrite the day the condition admits")
      assert(DeltaTable.forPath(spark, dir).toDF
        .filter($"id" === 999L).count() == 1)
    }
  }
}
