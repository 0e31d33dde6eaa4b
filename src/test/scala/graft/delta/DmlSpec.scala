package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DmlSpec extends SparkSpec {
  import spark.implicits._

  test("rewrite delete removes only matching rows and touches few files") {
    withTempDir { dir =>
      DeltaTable.write(
        spark.range(0, 1000).toDF("id").withColumn("flag", $"id" % 10 === 0)
          .repartitionByRange(8, $"id"),
        dir)
      val table = DeltaTable.forPath(spark, dir)
      table.delete($"id" >= 900L)
      assert(table.toDF.count() == 900)
      assert(table.toDF.agg(max($"id")).as[Long].head() == 899L)
      // stats-based skipping: only the file(s) covering [900, 1000) were
      // rewritten, the other 7 survived untouched
      val hist = table.history().filter($"operation" === "DELETE")
        .select($"operationMetrics").as[Map[String, String]].head()
      assert(hist("numRemovedFiles").toInt <= 2, hist.toString)
    }
  }

  test("UPDATE SET expressions see the pre-update row") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, 10), (5, 50)).toDF("a", "b"), dir)
      val table = DeltaTable.forPath(spark, dir)
      // swap semantics: both RHS must read the ORIGINAL row, and the
      // condition must not flip after a is rewritten
      table.update($"a" === 1, Map("a" -> ($"b" + 0), "b" -> ($"a" + 0)))
      assert(table.toDF.as[(Int, Int)].collect().toSet ==
        Set((10, 1), (5, 50)))
    }
  }

  test("overwrite without partitionBy keeps the table's partitioning") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "x"), (2, "y")).toDF("id", "part"),
        dir, partitionBy = Seq("part"))
      // the everyday overwrite: same schema, no partitionBy argument
      DeltaTable.write(Seq((9, "x")).toDF("id", "part"), dir,
        org.apache.spark.sql.SaveMode.Overwrite)
      val m = DeltaLog.forTable(spark, dir).update().metadata
      assert(m.partitionColumns == Seq("part"))
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 1)
      // and partition pruning still works on the overwritten data
      assert(DeltaTable.forPath(spark, dir).scan($"part" === "x")
        .getFiles.nonEmpty)
    }
  }

  test("delete with a null-producing condition keeps null rows") {
    withTempDir { dir =>
      DeltaTable.write(
        Seq((1, Some(5)), (2, None), (3, Some(50))).toDF("id", "v"), dir)
      DeltaTable.forPath(spark, dir).delete($"v" > 10)
      // row 3 deleted; row 2 (null condition) kept — SQL semantics
      assert(DeltaTable.forPath(spark, dir).toDF.select($"id")
        .as[Int].collect().sorted.toSeq == Seq(1, 2))
    }
  }

  test("update rewrites matching rows and records UPDATE in history") {
    withTempDir { dir =>
      DeltaTable.write(
        (1 to 100).map(i => (i, s"g${i % 2}", i * 1.0)).toDF("id", "grp", "score"),
        dir, partitionBy = Seq("grp"))
      val table = DeltaTable.forPath(spark, dir)
      val g0Before = DeltaLog.forTable(spark, dir).update().allFiles
        .filter(_.partitionValues("grp") == "g0").map(_.path).toSet
      table.update($"grp" === "g1" && $"id" < 10,
        Map("score" -> lit(-1.0)))
      val out = table.toDF
      assert(out.filter($"score" === -1.0).count() == 5) // ids 1,3,5,7,9
      assert(out.filter($"score" > 0).count() == 95)
      assert(out.count() == 100)
      assert(table.history().filter($"operation" === "UPDATE").count() == 1)
      // the g0 partition was never rewritten — same files before and after
      val g0After = DeltaLog.forTable(spark, dir).update().allFiles
        .filter(_.partitionValues("grp") == "g0").map(_.path).toSet
      assert(g0After == g0Before)
    }
  }

  test("update rejects unknown columns") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "a")).toDF("id", "part"), dir,
        partitionBy = Seq("part"))
      val table = DeltaTable.forPath(spark, dir)
      intercept[IllegalArgumentException] {
        table.update($"id" === 1, Map("nope" -> lit(1)))
      }
    }
  }

  test("partition-only delete stays metadata-only") {
    withTempDir { dir =>
      DeltaTable.write((1 to 20).map(i => (i, s"g${i % 2}")).toDF("v", "grp"),
        dir, partitionBy = Seq("grp"))
      val table = DeltaTable.forPath(spark, dir)
      val filesBefore = DeltaLog.forTable(spark, dir).update().allFiles
        .map(_.path).toSet
      table.delete($"grp" === "g0")
      val after = DeltaLog.forTable(spark, dir).update().allFiles.map(_.path).toSet
      // no new files were written — pure tombstoning
      assert(after.subsetOf(filesBefore))
      assert(table.toDF.count() == 10)
    }
  }

  test("UPDATE on a partition column relocates rows across partitions") {
    withTempDir { dir =>
      DeltaTable.write(
        Seq((1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0))
          .toDF("id", "part", "price"),
        dir, partitionBy = Seq("part"))
      val table = DeltaTable.forPath(spark, dir)
      table.update($"id" === 1, Map("part" -> lit("c")))
      val out = table.toDF.select($"id", $"part").as[(Int, String)]
        .collect().toMap
      assert(out == Map(1 -> "c", 2 -> "a", 3 -> "b"), out.toString)
      // the moved row reads through its NEW partition value (pruned scan)
      assert(table.toDF.filter($"part" === "c").select($"id").as[Int]
        .collect().toSeq == Seq(1))
      assert(table.toDF.filter($"part" === "a").select($"id").as[Int]
        .collect().toSeq == Seq(2))
      // MERGE SET on the partition column moves rows too
      table.merge(Seq((2, "z")).toDF("id", "p2"),
          col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("part" -> col("s.p2")))
        .execute()
      assert(table.toDF.filter($"part" === "z").select($"id").as[Int]
        .collect().toSeq == Seq(2))
    }
  }
}
