package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Generated columns: computed on append, equality-guarded when
  * provided, usable as partition columns for pruning. */
class GeneratedColumnsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("ts", TimestampType),
    StructField("day", StringType)))

  test("appends without the generated column get it computed and partitioned") {
    withTempDir { dir =>
      DeltaTable.create(spark, dir, schema,
        partitionBy = Seq("day"),
        generatedColumns = Map("day" -> "date_format(ts, 'yyyy-MM-dd')"))
      assert(DeltaTable.forPath(spark, dir).deltaLog.update()
        .protocol.minWriterVersion == 4)

      val events = Seq(
        (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
        (2L, java.sql.Timestamp.valueOf("2026-01-01 23:59:59")),
        (3L, java.sql.Timestamp.valueOf("2026-01-02 00:00:01")))
        .toDF("id", "ts").coalesce(1)
      DeltaTable.write(events, dir) // no day column supplied

      val table = DeltaTable.forPath(spark, dir)
      assert(table.toDF.select($"day").as[String].collect().sorted.toSeq ==
        Seq("2026-01-01", "2026-01-01", "2026-01-02"))
      // the generated column IS the partition column: files carry its
      // value in partitionValues and a day filter prunes to one file
      val scan = table.scan($"day" === "2026-01-01")
      assert(scan.getFiles.size == 1, s"expected 1 pruned file")
    }
  }

  test("a provided generated-column value must match the expression") {
    withTempDir { dir =>
      DeltaTable.create(spark, dir, schema,
        generatedColumns = Map("day" -> "date_format(ts, 'yyyy-MM-dd')"))
      val bad = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"),
        "2026-12-31")).toDF("id", "ts", "day")
      intercept[Exception] { DeltaTable.write(bad, dir) }
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 0)

      val good = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"),
        "2026-01-01")).toDF("id", "ts", "day")
      DeltaTable.write(good, dir)
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 1)
    }
  }

  test("a CASE-MISMATCHED provided value still hits the equality " +
      "invariant (not silently recomputed over)") {
    withTempDir { dir =>
      DeltaTable.create(spark, dir, schema,
        generatedColumns = Map("day" -> "date_format(ts, 'yyyy-MM-dd')"))
      // the frame spells it 'DAY': Spark resolves case-insensitively, so
      // this IS a user-provided value — materialize must not overwrite
      // it with the computed expression and mask the bad data
      val bad = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"),
        "2026-12-31")).toDF("id", "ts", "DAY")
      intercept[Exception] { DeltaTable.write(bad, dir) }
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 0)
    }
  }

  test("UPDATE that breaks the generation invariant is rejected") {
    withTempDir { dir =>
      DeltaTable.create(spark, dir, schema,
        generatedColumns = Map("day" -> "date_format(ts, 'yyyy-MM-dd')"))
      DeltaTable.write(
        Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")))
          .toDF("id", "ts"), dir)
      val table = DeltaTable.forPath(spark, dir)
      // setting day without ts desynchronizes them → write-job abort
      intercept[Exception] {
        table.update($"id" === 1L, Map("day" -> lit("1999-01-01")))
      }
      assert(table.toDF.select($"day").as[String].head() == "2026-01-01")
      // updating ts ALONE recomputes the generated column from its new
      // source value — the DML must stay possible, not abort on the
      // stale stored value
      table.update($"id" === 1L,
        Map("ts" -> lit(java.sql.Timestamp.valueOf("2027-06-06 00:00:00"))))
      assert(table.toDF.select($"day").as[String].head() == "2027-06-06")
      // a consistent explicit update of both also passes
      table.update($"id" === 1L, Map(
        "ts" -> lit(java.sql.Timestamp.valueOf("2028-03-03 00:00:00")),
        "day" -> lit("2028-03-03")))
      assert(table.toDF.select($"day").as[String].head() == "2028-03-03")
    }
  }

  test("UPDATE/MERGE on a generation source recomputes a generated " +
      "PARTITION column and relocates the row") {
    withTempDir { dir =>
      DeltaTable.create(spark, dir, schema,
        partitionBy = Seq("day"),
        generatedColumns = Map("day" -> "date_format(ts, 'yyyy-MM-dd')"))
      DeltaTable.write(
        Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
            (2L, java.sql.Timestamp.valueOf("2026-01-02 10:00:00")))
          .toDF("id", "ts"), dir)
      val table = DeltaTable.forPath(spark, dir)
      table.update($"id" === 1L,
        Map("ts" -> lit(java.sql.Timestamp.valueOf("2026-05-05 08:00:00"))))
      val got = table.toDF.select($"id", $"day").as[(Long, String)]
        .collect().toMap
      assert(got == Map(1L -> "2026-05-05", 2L -> "2026-01-02"), got.toString)
      // the moved row is readable through its new partition value
      assert(table.toDF.filter($"day" === "2026-05-05")
        .select($"id").as[Long].collect().toSeq == Seq(1L))

      // MERGE-update on the source column recomputes too
      table.merge(
          Seq((2L, java.sql.Timestamp.valueOf("2026-07-07 07:00:00")))
            .toDF("id", "ts"),
          col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("ts" -> col("s.ts")))
        .execute()
      val after = table.toDF.select($"id", $"day").as[(Long, String)]
        .collect().toMap
      assert(after == Map(1L -> "2026-05-05", 2L -> "2026-07-07"), after.toString)
    }
  }

  test("MERGE inserts and replaceWhere compute generated columns too") {
    withTempDir { dir =>
      DeltaTable.create(spark, dir, schema,
        partitionBy = Seq("day"),
        generatedColumns = Map("day" -> "date_format(ts, 'yyyy-MM-dd')"))
      DeltaTable.write(
        Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")))
          .toDF("id", "ts"), dir)
      val table = DeltaTable.forPath(spark, dir)

      // merge-insert WITHOUT the day column: computed, not null-filled
      table.merge(
          Seq((2L, java.sql.Timestamp.valueOf("2026-02-02 09:00:00")))
            .toDF("id", "ts"),
          col("t.id") === col("s.id"))
        .whenNotMatchedInsertAll()
        .execute()
      val got = table.toDF.select($"id", $"day").as[(Long, String)]
        .collect().toMap
      assert(got(2L) == "2026-02-02", s"merge insert day = ${got.get(2L)}")

      // replaceWhere without the generated column: also computed
      table.replaceWhere(
        Seq((9L, java.sql.Timestamp.valueOf("2026-01-01 23:00:00")))
          .toDF("id", "ts"),
        $"day" === "2026-01-01")
      val after = table.toDF.select($"id", $"day").as[(Long, String)]
        .collect().toMap
      assert(after == Map(9L -> "2026-01-01", 2L -> "2026-02-02"), after.toString)
    }
  }

  test("overwrite of a generated-column table: full schema works, " +
      "column-dropping rejects, and generation never fires on overwrite") {
    withTempDir { dir =>
      DeltaTable.create(spark, dir, schema,
        generatedColumns = Map("day" -> "date_format(ts, 'yyyy-MM-dd')"))
      DeltaTable.write(
        Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")))
          .toDF("id", "ts"), dir)

      // overwrite carrying the FULL consistent schema replaces content
      // and keeps the generation metadata
      DeltaTable.write(
        Seq((2L, java.sql.Timestamp.valueOf("2026-03-03 08:00:00"),
          "2026-03-03")).toDF("id", "ts", "day"),
        dir, org.apache.spark.sql.SaveMode.Overwrite)
      val m = DeltaTable.forPath(spark, dir).deltaLog.update().metadata
      assert(graft.delta.write.GeneratedColumns.expressions(m.schema)
        .map(_._1) == Seq("day"))

      // an overwrite whose schema DROPS columns is rejected (columns
      // never vanish outside explicit DDL) — and critically, generation
      // does not fire against the incompatible frame first (the old
      // expression may not even resolve)
      intercept[IllegalArgumentException] {
        DeltaTable.write(Seq((1L, "plain")).toDF("id", "label"), dir,
          org.apache.spark.sql.SaveMode.Overwrite)
      }
      assert(DeltaTable.forPath(spark, dir).toDF
        .select($"day").as[String].head() == "2026-03-03")
    }
  }

  test("streaming sink computes generated columns too") {
    withTempDir { base =>
      val dir = s"$base/t"
      val ckpt = s"$base/ckpt"
      DeltaTable.create(spark, dir, schema,
        generatedColumns = Map("day" -> "date_format(ts, 'yyyy-MM-dd')"))
      val src = s"$base/src"
      DeltaTable.write(
        Seq((1L, java.sql.Timestamp.valueOf("2026-03-03 08:00:00")))
          .toDF("id", "ts"), src)
      val q = spark.readStream.format("graft-delta").load(src)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", ckpt)
        .start(dir)
      try q.processAllAvailable() finally q.stop()
      assert(DeltaTable.forPath(spark, dir).toDF
        .select($"day").as[String].head() == "2026-03-03")
    }
  }
}
