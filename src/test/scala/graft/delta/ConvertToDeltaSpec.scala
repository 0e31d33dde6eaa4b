package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CONVERT TO DELTA: in-place adoption of a plain parquet directory. */
class ConvertToDeltaSpec extends SparkSpec {
  import spark.implicits._

  test("converts a partitioned parquet directory in place") {
    withTempDir { base =>
      val dir = s"$base/t"
      spark.range(0, 100).toDF("id")
        .withColumn("part", ($"id" % 4).cast("int"))
        .write.partitionBy("part").parquet(dir)
      val fsFilesBefore = countParquet(dir)

      DeltaTable.convertToDelta(spark, dir, Seq("part"))

      val table = DeltaTable.forPath(spark, dir)
      assert(table.toDF.count() == 100)
      assert(table.toDF.agg(sum($"id")).as[Long].head() == 4950L)
      // in place: not a single data file moved or copied
      assert(countParquet(dir) == fsFilesBefore)
      // partition pruning works off the parsed path values
      assert(table.scan($"part" === 1).getFiles
        .forall(_.partitionValues("part") == "1"))
      assert(table.toDF.filter($"part" === 1).count() == 25)
      assert(table.history().select($"operation").as[String].head() == "CONVERT")
      // adopted files carry footer-derived stats: data skipping works
      // from day one (id is range-partitioned by the original write)
      val files = table.deltaLog.update().allFiles
      assert(files.forall(_.stats.isDefined), "converted files lack stats")
      val total = files.flatMap(_.stats).map(s =>
        JsonCodec.mapper.readTree(s).get("numRecords").asLong).sum
      assert(total == 100L)

      // the converted table is fully live: appends + time travel
      DeltaTable.write(
        Seq((1000L, 1)).toDF("id", "part"), dir)
      assert(table.toDF.count() == 101)
      assert(table.asOfVersion(0).count() == 100)
    }
  }

  test("unpartitioned convert and double-convert rejection") {
    withTempDir { base =>
      val dir = s"$base/t"
      spark.range(0, 10).toDF("id").write.parquet(dir)
      DeltaTable.convertToDelta(spark, dir)
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 10)
      val e = intercept[IllegalArgumentException] {
        DeltaTable.convertToDelta(spark, dir)
      }
      assert(e.getMessage.contains("already a Delta table"))
    }
  }

  test("partitioned layout without declared partition columns fails") {
    withTempDir { base =>
      val dir = s"$base/t"
      spark.range(0, 10).toDF("id")
        .withColumn("part", ($"id" % 2).cast("int"))
        .write.partitionBy("part").parquet(dir)
      intercept[Exception] { DeltaTable.convertToDelta(spark, dir) }
      // nothing was committed — the directory is still convertible
      assert(!DeltaTable.isDeltaTable(spark, dir))
      DeltaTable.convertToDelta(spark, dir, Seq("part"))
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 10)
    }
  }

  test("SQL: CONVERT TO DELTA with PARTITIONED BY") {
    withTempDir { base =>
      val dir = s"$base/t"
      spark.range(0, 20).toDF("id")
        .withColumn("day", concat(lit("2026-01-0"), ($"id" % 3 + 1)))
        .write.partitionBy("day").parquet(dir)
      val out = spark.sql(
        s"CONVERT TO DELTA '$dir' PARTITIONED BY (day string)").collect()
      assert(out.head.getLong(1) > 0)
      assert(DeltaTable.forPath(spark, dir).toDF
        .filter($"day" === "2026-01-01").count() > 0)
    }
  }

  private def countParquet(dir: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
  }
}
