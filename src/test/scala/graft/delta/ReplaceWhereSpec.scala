package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** replaceWhere: transactional partition overwrite. */
class ReplaceWhereSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(dir: String): DeltaTable = {
    DeltaTable.write(
      Seq((1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 40.0))
        .toDF("id", "part", "v")
        .coalesce(1), // one file per partition dir — deterministic counts
      dir, partitionBy = Seq("part"))
    DeltaTable.forPath(spark, dir)
  }

  test("replaces exactly the matching partitions in one commit") {
    withTempDir { dir =>
      val table = mkTable(dir)
      val v0 = table.version
      table.replaceWhere(
        Seq((9, "a", 90.0)).toDF("id", "part", "v"), $"part" === "a")
      assert(table.version == v0 + 1) // one commit for remove+add
      assert(table.toDF.select($"id").as[Int].collect().sorted.toSeq ==
        Seq(3, 4, 9))
      val hist = table.history().filter($"operation" === "REPLACE WHERE")
        .select($"operationMetrics").as[Map[String, String]].head()
      assert(hist("numRemovedFiles").toInt == 1) // only partition a's file
      // untouched partitions survive as the same physical files
      assert(table.toDF.filter($"part" === "b").select($"v").as[Double]
        .head() == 30.0)
    }
  }

  test("a row outside the replaced region aborts with nothing committed") {
    withTempDir { dir =>
      val table = mkTable(dir)
      val v0 = table.version
      intercept[Exception] {
        table.replaceWhere(
          Seq((9, "a", 90.0), (10, "b", 100.0)).toDF("id", "part", "v"),
          $"part" === "a")
      }
      assert(table.version == v0)
      assert(table.toDF.count() == 4)
    }
  }

  test("schema discipline: missing, retyped or extra columns are rejected") {
    withTempDir { dir =>
      val table = mkTable(dir)
      // missing column v
      intercept[IllegalArgumentException] {
        table.replaceWhere(Seq((9, "a")).toDF("id", "part"), $"part" === "a")
      }
      // retyped column v
      intercept[IllegalArgumentException] {
        table.replaceWhere(Seq((9, "a", "not-a-double")).toDF("id", "part", "v"),
          $"part" === "a")
      }
      // smuggled extra column
      intercept[IllegalArgumentException] {
        table.replaceWhere(
          Seq((9, "a", 90.0, "extra")).toDF("id", "part", "v", "x"),
          $"part" === "a")
      }
      assert(table.toDF.count() == 4) // untouched through all three
    }
  }

  test("non-partition predicates are rejected up front") {
    withTempDir { dir =>
      val table = mkTable(dir)
      val e = intercept[IllegalArgumentException] {
        table.replaceWhere(Seq((9, "a", 90.0)).toDF("id", "part", "v"),
          $"v" > 15.0)
      }
      assert(e.getMessage.contains("partition columns only"))
    }
  }

  test("replaceWhere into an empty region is a plain scoped insert") {
    withTempDir { dir =>
      val table = mkTable(dir)
      table.replaceWhere(
        Seq((7, "z", 70.0)).toDF("id", "part", "v"), $"part" === "z")
      assert(table.toDF.count() == 5)
      val hist = table.history().filter($"operation" === "REPLACE WHERE")
        .select($"operationMetrics").as[Map[String, String]].head()
      assert(hist("numRemovedFiles").toInt == 0)
    }
  }

  test("CDF-enabled tables record delete+insert images for replaceWhere") {
    withTempDir { dir =>
      DeltaTable.write(
        Seq((1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0))
          .toDF("id", "part", "v").coalesce(1),
        dir, partitionBy = Seq("part"),
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      val table = DeltaTable.forPath(spark, dir)
      val v = table.replaceWhere(
        Seq((9, "a", 90.0)).toDF("id", "part", "v"), $"part" === "a")

      val changes = table.changes(v, v)
        .select($"id", col(write.CdcWriter.ChangeTypeCol))
        .as[(Int, String)].collect().toSet
      assert(changes == Set((1, "delete"), (2, "delete"), (9, "insert")),
        changes.toString)
    }
  }

  test("a readChangeFeed stream serves replaceWhere's recorded images") {
    withTempDir { base =>
      val dir = s"$base/t"
      DeltaTable.write(
        Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("id", "part", "v").coalesce(1),
        dir, partitionBy = Seq("part"),
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      DeltaTable.forPath(spark, dir).replaceWhere(
        Seq((9, "a", 90.0)).toDF("id", "part", "v"), $"part" === "a")

      val q = spark.readStream.format("graft-delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load(dir)
        .writeStream.format("memory").queryName("rw_cdf")
        .start()
      try {
        q.processAllAvailable()
        val got = spark.table("rw_cdf")
          .select($"id", col(write.CdcWriter.ChangeTypeCol))
          .as[(Int, String)].collect().toSet
        assert(got == Set((1, "delete"), (9, "insert")), got.toString)
      } finally q.stop()
    }
  }

  test("streams across replaceWhere fail without ignoreChanges (F3)") {
    withTempDir { base =>
      val dir = s"$base/t"
      val table = mkTable(dir)
      table.replaceWhere(
        Seq((9, "a", 90.0)).toDF("id", "part", "v"), $"part" === "a")
      // a replaceWhere commit carries adds AND removes with dataChange:
      // the change-sanitation rules treat it like any rewrite commit
      val q = spark.readStream.format("graft-delta")
        .option("startingVersion", "0")
        .load(dir)
        .writeStream.format("memory").queryName("rw_stream")
        .start()
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.stop()
        throw new IllegalStateException("expected the stream to fail")
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(err).exists(m => m.contains("ignoreChanges") ||
        m.contains("data update")), err.toString)
    }
  }
}
