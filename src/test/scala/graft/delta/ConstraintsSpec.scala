package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** CHECK constraints + NOT NULL invariants: write-time enforcement,
  * protocol upgrade, SQL statement surface, history operations. */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  test("ADD CONSTRAINT verifies existing rows and upgrades the protocol") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, 10), (2, 20)).toDF("id", "v"), dir)
      val table = DeltaTable.forPath(spark, dir)

      // existing data violates → rejected, nothing committed
      val before = table.deltaLog.update().version
      val e = intercept[IllegalArgumentException] {
        table.addConstraint("v_small", "v < 15")
      }
      assert(e.getMessage.contains("existing rows violate"))
      assert(table.deltaLog.update().version == before)

      table.addConstraint("v_positive", "v > 0")
      val snap = table.deltaLog.update()
      assert(snap.metadata.configuration("delta.constraints.v_positive") == "v > 0")
      // CHECK constraints are a writer-3 feature
      assert(snap.protocol.minWriterVersion == 3)
      assert(table.history().filter($"operation" === "ADD CONSTRAINT").count() == 1)
    }
  }

  test("violating append fails the write job and leaves no commit") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, 10)).toDF("id", "v"), dir)
      val table = DeltaTable.forPath(spark, dir)
      table.addConstraint("v_positive", "v > 0")
      val before = table.deltaLog.update().version

      val err = intercept[Exception] {
        DeltaTable.write(Seq((3, -1)).toDF("id", "v"), dir)
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
      assert(messages(err).exists(m => m != null && m.contains("v_positive")),
        err.toString)
      // the failed write never committed, and the table still reads clean
      assert(table.deltaLog.update().version == before)
      assert(table.toDF.count() == 1)

      // a passing append still works, and mixed batches fail atomically
      DeltaTable.write(Seq((4, 40)).toDF("id", "v"), dir)
      assert(table.toDF.count() == 2)
      intercept[Exception] {
        DeltaTable.write(Seq((5, 50), (6, -6)).toDF("id", "v"), dir)
      }
      assert(table.toDF.count() == 2)
    }
  }

  test("constraints are enforced through UPDATE and MERGE") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, 10), (2, 20)).toDF("id", "v"), dir)
      val table = DeltaTable.forPath(spark, dir)
      table.addConstraint("v_positive", "v > 0")

      intercept[Exception] {
        table.update($"id" === 1, Map("v" -> lit(-5)))
      }
      assert(table.toDF.filter($"v" < 0).count() == 0)

      intercept[Exception] {
        table.merge(Seq((2, -20)).toDF("id", "v"), col("t.id") === col("s.id"))
          .whenMatchedUpdate(Map("v" -> col("s.v"))).execute()
      }
      assert(table.toDF.filter($"v" < 0).count() == 0)
      // a valid merge still goes through
      table.merge(Seq((2, 200)).toDF("id", "v"), col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("v" -> col("s.v"))).execute()
      assert(table.toDF.filter($"id" === 2).select($"v").as[Int].head() == 200)
    }
  }

  test("DROP CONSTRAINT re-admits previously violating rows") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, 10)).toDF("id", "v"), dir)
      val table = DeltaTable.forPath(spark, dir)
      table.addConstraint("v_positive", "v > 0")
      intercept[IllegalArgumentException] { table.dropConstraint("nope") }
      table.dropConstraint("nope", ifExists = true) // no-op
      table.dropConstraint("v_positive")
      DeltaTable.write(Seq((2, -2)).toDF("id", "v"), dir)
      assert(table.toDF.count() == 2)
      assert(table.history().filter($"operation" === "DROP CONSTRAINT").count() == 1)
    }
  }

  test("NOT NULL schema fields are enforced on append") {
    withTempDir { dir =>
      // NOT NULL is an explicit DDL decision (writes store schemas
      // relaxed — encoder non-nullability is accidental), so declare it
      // in the table-defining first commit, as catalog CREATE TABLE does
      val log = DeltaLog.forTable(spark, dir)
      val create = log.startTransaction()
      create.updateMetadata(graft.delta.Metadata(schemaString = Some(StructType(Seq(
        StructField("id", IntegerType, nullable = true),
        StructField("s", StringType, nullable = false))).json)))
      create.commit(Nil, DeltaOperations.CreateTable)
      DeltaTable.write(Seq((1, "a")).toDF("id", "s"), dir)
      val table = DeltaTable.forPath(spark, dir)
      assert(!table.deltaLog.update().metadata.schema("s").nullable)

      val nullable = spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(2, null)),
        StructType(Seq(StructField("id", IntegerType, nullable = false),
          StructField("s", StringType, nullable = true))))
      intercept[Exception] { DeltaTable.write(nullable, dir) }
      assert(table.toDF.count() == 1)

      val ok = spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(2, "b")),
        StructType(Seq(StructField("id", IntegerType, nullable = false),
          StructField("s", StringType, nullable = true))))
      DeltaTable.write(ok, dir)
      assert(table.toDF.count() == 2)
    }
  }

  test("SQL: ALTER TABLE ADD/DROP CONSTRAINT round-trips") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, 10)).toDF("id", "v"), dir)
      spark.sql(s"ALTER TABLE '$dir' ADD CONSTRAINT v_cap CHECK (v < 100 AND v > 0)")
      val table = DeltaTable.forPath(spark, dir)
      assert(table.deltaLog.update().metadata
        .configuration("delta.constraints.v_cap") == "v < 100 AND v > 0")
      intercept[Exception] {
        DeltaTable.write(Seq((2, 150)).toDF("id", "v"), dir)
      }
      spark.sql(s"ALTER TABLE '$dir' DROP CONSTRAINT v_cap")
      DeltaTable.write(Seq((2, 150)).toDF("id", "v"), dir)
      assert(table.toDF.count() == 2)
      spark.sql(s"ALTER TABLE '$dir' DROP CONSTRAINT IF EXISTS v_cap")
    }
  }

  test("dropping a column referenced by a constraint or generation is refused") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, 10, "x")).toDF("id", "v", "tag"), dir)
      val table = DeltaTable.forPath(spark, dir)
      table.addConstraint("v_pos", "v > 0")

      def dropColumn(name: String): Unit = {
        val txn = table.deltaLog.startTransaction()
        val m = txn.snapshot.metadata
        txn.updateMetadata(m.copy(schemaString = Some(StructType(
          m.schema.fields.filterNot(_.name == name)).json)),
          allowColumnRemoval = true)
        txn.commit(Nil, "DROP COLUMNS")
      }
      val e = intercept[IllegalArgumentException] { dropColumn("v") }
      assert(e.getMessage.contains("v_pos"), e.getMessage)
      // an unreferenced column still drops
      dropColumn("tag")
      assert(table.toDF.columns.toSeq == Seq("id", "v"))
      // after dropping the constraint, the column drops too
      table.dropConstraint("v_pos")
      dropColumn("v")
      assert(table.toDF.columns.toSeq == Seq("id"))
    }
  }

  test("append-time evolution cannot resurrect a dropped column") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "secret")).toDF("id", "pii"), dir)
      val table = DeltaTable.forPath(spark, dir)
      // engine-level drop with quarantine, as the catalog's DROP COLUMN does
      val txn = table.deltaLog.startTransaction()
      val m = txn.snapshot.metadata
      txn.updateMetadata(m.copy(
        schemaString = Some(StructType(
          m.schema.fields.filterNot(_.name == "pii")).json),
        configuration = m.configuration +
          (graft.delta.ColumnMapping.DroppedPhysicalKey -> "pii")),
        allowColumnRemoval = true)
      txn.commit(Nil, "DROP COLUMNS")

      // a plain append carrying a column named pii would bind to the old
      // bytes — the resurrection is refused at the metadata gate
      val e = intercept[Exception] {
        DeltaTable.write(Seq((2, "fresh")).toDF("id", "pii"), dir)
      }
      assert(e.getMessage.contains("resurrect"), e.getMessage)
      assert(table.toDF.columns.toSeq == Seq("id"))
    }
  }

  test("a third-party table requiring writer > 3 is refused") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, 10)).toDF("id", "v"), dir)
      // hand-edit the log: a foreign engine bumps the protocol to (1, 7)
      val log = DeltaLog.forTable(spark, dir)
      val store = log.store
      store.write(
        FileNames.deltaFile(log.logPath, 1L),
        Iterator(
          """{"protocol":{"minReaderVersion":1,"minWriterVersion":7}}"""),
        overwrite = false,
        conf = log.hadoopConf)
      DeltaLog.clearCache()
      val table = DeltaTable.forPath(spark, dir)
      val e = intercept[Exception] {
        DeltaTable.write(Seq((2, 20)).toDF("id", "v"), dir)
      }
      // writer 7 without a writerFeatures list: refused as unknown
      // territory (the features vocabulary gate names what is missing)
      assert(e.getMessage.contains("writerFeatures unspecified"), e.getMessage)
    }
  }
}
