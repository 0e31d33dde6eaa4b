package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** VARIANT columns: write/read round-trip through the engine, the
  * variantType feature auto-declared on both protocol sides, DML and
  * time travel over variant data. */
class VariantSpec extends SparkSpec {
  import spark.implicits._

  test("variant round-trips and the protocol declares the feature") {
    withTempDir { dir =>
      val df = spark.sql(
        """SELECT id, parse_json(concat('{"a":', id, ',"tag":"t', id, '"}'))
          |  AS v FROM range(5)""".stripMargin)
      DeltaTable.write(df, dir)
      val snap = DeltaLog.forTable(spark, dir).update()
      val p = snap.protocol
      assert(p.minReaderVersion == 3 && p.minWriterVersion == 7)
      assert(p.readerFeatures.exists(_.contains("variantType")) &&
        p.writerFeatures.exists(_.contains("variantType")))
      assert(snap.metadata.schema("v").dataType ==
        org.apache.spark.sql.types.VariantType)
      DeltaTable.forPath(spark, dir).toDF.createOrReplaceTempView("vt")
      val out = spark.sql(
        "SELECT id, variant_get(v, '$.a', 'long') AS a, " +
          "variant_get(v, '$.tag', 'string') AS tag FROM vt")
        .as[(Long, Long, String)].collect().toSet
      assert(out == (0L until 5L).map(i => (i, i, s"t$i")).toSet)
    }
  }

  test("DML and time travel over variant data") {
    withTempDir { dir =>
      DeltaTable.write(spark.sql(
        """SELECT id, parse_json(concat('{"n":', id * 10, '}')) AS v
          |FROM range(4)""".stripMargin), dir)
      val table = DeltaTable.forPath(spark, dir)
      table.delete(expr("variant_get(v, '$.n', 'long') >= 30"))
      assert(table.toDF.count() == 3)
      // v0 still reads all four through time travel
      assert(table.asOfVersion(0).count() == 4)
      // appends keep working; the upgrade is once
      DeltaTable.write(spark.sql(
        "SELECT id, parse_json('{\"n\":99}') AS v FROM range(100, 101)"), dir)
      assert(table.toDF.count() == 4)
      val hist = DeltaLog.forTable(spark, dir).update()
      assert(hist.protocol.writerFeatures.get.count(_ == "variantType") == 1)
    }
  }

  test("stats skip variant columns but keep numRecords (row tracking works)") {
    withTempDir { dir =>
      DeltaTable.write(spark.sql(
        """SELECT id, parse_json(concat('{"x":', id, '}')) AS v
          |FROM range(6)""".stripMargin).coalesce(1), dir,
        configuration = Map("delta.enableRowTracking" -> "true"))
      val snap = DeltaLog.forTable(spark, dir).update()
      val add = snap.allFiles.head
      val stats = JsonCodec.mapper.readTree(add.stats.get)
      assert(stats.get("numRecords").asLong() == 6L)
      assert(!stats.get("minValues").has("v")) // variant not min/max-able
      assert(add.baseRowId.contains(0L))
      val ids = DeltaTable.forPath(spark, dir).toDFWithRowIds
        .select(col("_row_id")).as[Long].collect().sorted
      assert(ids === (0L until 6L).toArray)
    }
  }
}
