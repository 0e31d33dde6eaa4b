package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Type widening: metadata-only column growth, old narrow files upcast
  * at scan, undeclared changes still refused, protocol carries the
  * feature on both sides. */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  test("int to long: old files upcast, new files store long") {
    withTempDir { dir =>
      DeltaTable.write(Seq(1, 2, 3).toDF("v")
        .select($"v".cast("int").as("v")).coalesce(1), dir)
      val table = DeltaTable.forPath(spark, dir)
      val alterVersion = table.widenColumnType("v", LongType)
      DeltaTable.write(Seq(10000000000L, 4L).toDF("v").coalesce(1), dir)
      val out = table.toDF
      assert(out.schema("v").dataType == LongType)
      assert(out.as[Long].collect().sorted
        === Array(1L, 2L, 3L, 4L, 10000000000L))
      // predicate over the wide domain still reads the narrow files
      assert(table.toDF.filter($"v" <= 2L).count() == 2)
      val snap = DeltaLog.forTable(spark, dir).update()
      val p = snap.protocol
      assert(p.minReaderVersion == 3 && p.minWriterVersion == 7 &&
        p.readerFeatures.exists(_.contains("typeWidening")) &&
        p.writerFeatures.exists(_.contains("typeWidening")))
      // the change is recorded with the ALTER's actual commit version
      val changes = snap.metadata.schema("v").metadata
        .getMetadataArray(TypeWidening.TypeChangesKey)
      assert(changes.length == 1)
      assert(changes.head.getString("fromType") == "integer")
      assert(changes.head.getString("toType") == "long")
      assert(changes.head.getLong("tableVersion") == alterVersion)
    }
  }

  test("undeclared type change in a metadata update stays refused") {
    withTempDir { dir =>
      DeltaTable.write(Seq(1, 2).toDF("v")
        .select($"v".cast("int").as("v")).coalesce(1), dir)
      val log = DeltaLog.forTable(spark, dir)
      val txn = log.startTransaction()
      val m = txn.snapshot.metadata
      val bare = StructType(Seq(StructField("v", LongType)))
      val e = intercept[IllegalArgumentException] {
        txn.updateMetadata(m.copy(schemaString = Some(bare.json)))
      }
      assert(e.getMessage.contains("not write-compatible"))
      // narrowing is refused even as a "declared" change
      val e2 = intercept[IllegalArgumentException] {
        DeltaTable.forPath(spark, dir).widenColumnType("v", ShortType)
      }
      assert(e2.getMessage.contains("widening matrix"))
    }
  }

  test("decimal growth and float to double") {
    withTempDir { dir =>
      DeltaTable.write(
        Seq(("3.14", "1.5")).toDF("d", "f")
          .select($"d".cast(DecimalType(10, 2)).as("d"),
                  $"f".cast("float").as("f")).coalesce(1), dir)
      val table = DeltaTable.forPath(spark, dir)
      table.widenColumnType("d", DecimalType(12, 4))
      table.widenColumnType("f", DoubleType)
      val out = table.toDF
      assert(out.schema("d").dataType == DecimalType(12, 4))
      assert(out.schema("f").dataType == DoubleType)
      val r = out.collect().head
      assert(r.getDecimal(0).toPlainString == "3.1400")
      assert(r.getDouble(1) == 1.5)
      // shrinking integer-digit capacity is refused
      val e = intercept[IllegalArgumentException] {
        table.widenColumnType("d", DecimalType(12, 6))
      }
      assert(e.getMessage.contains("widening matrix"))
    }
  }

  test("chained widenings record every step and stay readable") {
    withTempDir { dir =>
      DeltaTable.write(Seq(1, 7).toDF("v")
        .select($"v".cast("smallint").as("v")).coalesce(1), dir)
      val table = DeltaTable.forPath(spark, dir)
      table.widenColumnType("v", IntegerType)
      DeltaTable.write(Seq(100000).toDF("v")
        .select($"v".cast("int").as("v")).coalesce(1), dir)
      table.widenColumnType("v", LongType)
      DeltaTable.write(Seq(10000000000L).toDF("v").coalesce(1), dir)
      assert(table.toDF.as[Long].collect().sorted
        === Array(1L, 7L, 100000L, 10000000000L))
      val changes = DeltaLog.forTable(spark, dir).update()
        .metadata.schema("v").metadata
        .getMetadataArray(TypeWidening.TypeChangesKey)
      assert(changes.map(e =>
        (e.getString("fromType"), e.getString("toType"))).toSeq ==
        Seq(("short", "integer"), ("integer", "long")))
    }
  }
}
