package graft.delta

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }
    scan.map(s => s.relation.location
      .listFiles(s.partitionFilters, s.dataFilters)
      .map(_.files.length.toLong).sum).getOrElse(-1L)
  }

  test("z-order compaction makes multi-column data skipping effective") {
    withTempDir { dir =>
      // a and b are independent; round-robin files span the full range of
      // BOTH columns, so nothing can skip before clustering
      val df = spark.range(0, 4096).select(
        (col("id") % 64).as("a"),
        ((col("id") / 64).cast("long") % 64).as("b"),
        col("id").as("payload")).repartition(16)
      DeltaTable.write(df, dir)
      val table = DeltaTable.forPath(spark, dir)
      val point = () => table.toDF.filter($"a" === 3L && $"b" === 7L)
      assert(point().count() == 1)
      val before = filesRead(point())
      assert(before >= 12, s"expected ~16 files read before clustering, got $before")

      val totalBytes = DeltaLog.forTable(spark, dir).update().sizeInBytes
      table.compact(targetFileBytes = totalBytes / 16 + 1, zOrderBy = Seq("a", "b"))

      DeltaLog.clearCache()
      val t2 = DeltaTable.forPath(spark, dir)
      val nFiles = DeltaLog.forTable(spark, dir).update().numOfFiles
      assert(nFiles >= 8, s"want several output files, got $nFiles")
      // data unchanged
      assert(t2.toDF.count() == 4096)
      assert(t2.toDF.filter($"a" === 3L && $"b" === 7L).count() == 1)
      // the SAME point predicate now touches a small corner of the files
      val after = filesRead(t2.toDF.filter($"a" === 3L && $"b" === 7L))
      assert(after * 4 <= before,
        s"z-order should cut files read at least 4x: before=$before after=$after")
      // a 2-d range predicate prunes too (range locality, not just equality)
      val box = t2.toDF.filter($"a".between(10L, 12L) && $"b".between(20L, 22L))
      assert(box.count() == 9)
      assert(filesRead(box) < before)
    }
  }

  test("z-order on a string column clusters equality predicates") {
    withTempDir { dir =>
      val df = spark.range(0, 2000).select(
        concat(lit("key"), (col("id") % 50).cast("string")).as("k"),
        col("id").as("v")).repartition(8)
      DeltaTable.write(df, dir)
      val table = DeltaTable.forPath(spark, dir)
      val before = filesRead(table.toDF.filter($"k" === "key7"))
      val totalBytes = DeltaLog.forTable(spark, dir).update().sizeInBytes
      table.compact(targetFileBytes = totalBytes / 8 + 1, zOrderBy = Seq("k"))
      DeltaLog.clearCache()
      val t2 = DeltaTable.forPath(spark, dir)
      assert(t2.toDF.filter($"k" === "key7").count() == 40)
      val after = filesRead(t2.toDF.filter($"k" === "key7"))
      assert(after <= 2,
        s"order-encoded string clustering should touch few files: $after")
      // prefix ranges prune too (the encoding is order-preserving)
      val range = t2.toDF.filter($"k" >= "key30" && $"k" <= "key34")
      assert(filesRead(range) < before)
    }
  }

  test("z-order rejects partition and unknown columns; records the operation") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "p1", 2.0), (2, "p2", 3.0)).toDF("id", "p", "x"),
        dir, partitionBy = Seq("p"))
      val table = DeltaTable.forPath(spark, dir)
      intercept[IllegalArgumentException] { table.compact(zOrderBy = Seq("p")) }
      intercept[IllegalArgumentException] { table.compact(zOrderBy = Seq("nope")) }
      table.compact(zOrderBy = Seq("id"))
      val hist = DeltaLog.forTable(spark, dir).history()
      val opt = hist.find(_.operation.contains("OPTIMIZE"))
      assert(opt.isDefined)
      // zOrderBy is an operation INPUT: recorded as a JSON-encoded
      // operationParameter (DESCRIBE HISTORY convention), not a metric
      assert(opt.get.operationParameters
        .exists(_.get("zOrderBy").contains("[\"id\"]")))
    }
  }

  test("z-order on a partitioned table does not multiply files across " +
      "partitions") {
    withTempDir { dir =>
      // 3 partitions × 4 files of a few rows each
      (1 to 4).foreach { i =>
        DeltaTable.write(
          (0 until 30).map(j => (i * 100 + j, s"p${j % 3}")).toDF("id", "grp"),
          dir, partitionBy = if (i == 1) Seq("grp") else Nil)
      }
      val log = DeltaLog.forTable(spark, dir)
      val before = log.update()
      val totalBytes = before.allFiles.map(_.size).sum
      val target = 4096L
      val numOut = math.max(1, math.ceil(totalBytes.toDouble / target).toInt)
      assert(numOut >= 2, s"test needs >1 range task, got $numOut")
      val expected = before.toDF.as[(Int, String)].collect().toSet

      DeltaTable.forPath(spark, dir)
        .compact(targetFileBytes = target, zOrderBy = Seq("id"))
      val after = log.update()
      // range keys lead with the partition column, so each range task
      // holds at most two table partitions: files <= tasks + partitions-1.
      // A z-only global range would write up to tasks × partitions files.
      assert(after.allFiles.size <= numOut + 3 - 1,
        s"${after.allFiles.size} files from $numOut tasks × 3 partitions")
      assert(after.toDF.as[(Int, String)].collect().toSet == expected)
    }
  }
}
