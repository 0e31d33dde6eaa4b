package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Column defaults (writer feature allowColumnDefaults): CURRENT_DEFAULT
  * field metadata, write-time materialization on appends that omit the
  * column, provided-value precedence, feature auto-declaration, and the
  * foreign-table read/write that used to refuse by feature name. */
class ColumnDefaultsSpec extends SparkSpec {
  import spark.implicits._

  test("appends omitting a defaulted column materialize the default; provided wins") {
    withTempDir { dir =>
      DeltaTable.write(
        Seq((1L, "alice", "seed"), (2L, "bob", "seed"))
          .toDF("id", "name", "status"), dir)
      val tbl = DeltaTable.forPath(spark, dir)
      tbl.setColumnDefault("status", "'active'")
      // append WITHOUT the column: default materializes at write time
      DeltaTable.write(Seq((3L, "carol")).toDF("id", "name"), dir)
      // append WITH the column: the provided value wins
      DeltaTable.write(Seq((4L, "dave", "vip")).toDF("id", "name", "status"),
        dir)
      val rows = tbl.toDF.select($"id", $"status").as[(Long, String)]
        .collect().toMap
      assert(rows == Map(1L -> "seed", 2L -> "seed",
        3L -> "active", 4L -> "vip"))
      // defaults affect FUTURE writes only: pre-existing rows unchanged
      assert(rows(1L) == "seed")
    }
  }

  test("first DEFAULT declaration auto-declares allowColumnDefaults") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1L, "x")).toDF("id", "v"), dir)
      val log = DeltaLog.forTable(spark, dir)
      val before = log.update().protocol
      assert(!before.writerFeatures.exists(_.contains("allowColumnDefaults")))
      DeltaTable.forPath(spark, dir).setColumnDefault("v", "'filled'")
      val after = log.update().protocol
      assert(after.minWriterVersion == 7 &&
        after.writerFeatures.exists(_.contains("allowColumnDefaults")),
        s"expected auto-declared feature, got $after")
      // non-literal (but input-free) default expressions work too
      DeltaTable.forPath(spark, dir).setColumnDefault("v", "upper('ok')")
      DeltaTable.write(Seq(Tuple1(9L)).toDF("id"), dir)
      val v9 = DeltaTable.forPath(spark, dir).toDF
        .filter($"id" === 9L).select($"v").as[String].head()
      assert(v9 == "OK")
    }
  }

  test("dropColumnDefault: omitting appends fail loudly again") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1L, "a")).toDF("id", "v"), dir)
      val tbl = DeltaTable.forPath(spark, dir)
      tbl.setColumnDefault("v", "'d'")
      DeltaTable.write(Seq(Tuple1(2L)).toDF("id"), dir)
      tbl.dropColumnDefault("v")
      // without the default the engine's strict append contract is back:
      // a frame missing a table column is refused, not silently null-filled
      val e = intercept[IllegalArgumentException] {
        DeltaTable.write(Seq(Tuple1(3L)).toDF("id"), dir)
      }
      assert(e.getMessage.contains("missing column"))
      val rows = tbl.toDF.select($"id", $"v").as[(Long, String)]
        .collect().toMap
      assert(rows == Map(1L -> "a", 2L -> "d"))
      // dropping twice fails loudly unless ifExists
      intercept[IllegalArgumentException] { tbl.dropColumnDefault("v") }
      tbl.dropColumnDefault("v", ifExists = true)
    }
  }

  test("errors: unknown column, unresolvable default expression") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1L, "a")).toDF("id", "v"), dir)
      val tbl = DeltaTable.forPath(spark, dir)
      intercept[IllegalArgumentException] {
        tbl.setColumnDefault("nope", "'x'")
      }
      intercept[Exception] {
        tbl.setColumnDefault("v", "some_other_column + 1")
      }
    }
  }

  test("foreign table declaring allowColumnDefaults reads and writes") {
    withTempDir { dir =>
      // a delta-spark-shaped log: features protocol listing
      // allowColumnDefaults, schema carrying CURRENT_DEFAULT metadata —
      // exactly what delta-spark >= 3.0 writes after a DEFAULT DDL.
      // Before this feature landed, the writer gate refused this table
      // by name.
      DeltaTable.write(Seq((1L, "seeded")).toDF("id", "status"), dir)
      val log = DeltaLog.forTable(spark, dir)
      val schema = StructType(Seq(
        StructField("id", LongType),
        StructField("status", StringType,
          metadata = new MetadataBuilder()
            .putString("CURRENT_DEFAULT", "'foreign_default'").build())))
      val m = log.update().metadata.copy(schemaString = Some(schema.json))
      val p = Protocol(1, 7, writerFeatures = Some(Seq(
        "appendOnly", "invariants", "allowColumnDefaults")))
      log.store.write(FileNames.deltaFile(log.logPath, 1),
        Iterator(JsonCodec.toJson(p: Action), JsonCodec.toJson(m: Action)),
        overwrite = false, log.hadoopConf)
      DeltaLog.clearCache()
      // read works, and an omitting append honors the foreign default
      val tbl = DeltaTable.forPath(spark, dir)
      assert(tbl.toDF.count() == 1)
      DeltaTable.write(Seq(Tuple1(2L)).toDF("id"), dir)
      val rows = tbl.toDF.select($"id", $"status").as[(Long, String)]
        .collect().toMap
      assert(rows == Map(1L -> "seeded", 2L -> "foreign_default"))
    }
  }
}
