package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Feature COMBINATIONS the individual suites never exercise together —
  * historically where the silent failures hid (rounds 2-3 found data
  * corruption in exactly such never-combined configurations). */
class CombinedFeatureSpec extends SparkSpec {
  import spark.implicits._

  test("autoCompact and optimizeWrite together: writes land, files fold") {
    withTempDir { dir =>
      (1 to 5).foreach { i =>
        DeltaTable.write(
          spark.range(i * 10, i * 10 + 10).toDF("v").repartition(4), dir,
          configuration = if (i == 1) Map(
            "delta.autoOptimize.optimizeWrite" -> "true",
            "delta.autoOptimize.autoCompact" -> "true") else Map.empty)
      }
      val snap = DeltaLog.forTable(spark, dir).update()
      assert(snap.toDF.count() == 50)
      assert(snap.allFiles.size <= 2,
        s"optimizeWrite+autoCompact left ${snap.allFiles.size} files")
    }
  }

  test("merge schema evolution on a CDF table records readable images") {
    withTempDir { dir =>
      DeltaTable.write((1 to 3).map(i => (i, i * 1.0)).toDF("id", "price"),
        dir, configuration = Map("delta.enableChangeDataFeed" -> "true"))
      val table = DeltaTable.forPath(spark, dir)
      table.merge(Seq((2, 200.0, "t2"), (4, 400.0, "t4"))
            .toDF("id", "price", "tag"),
          col("t.id") === col("s.id"))
        .withSchemaEvolution()
        .whenMatchedUpdate(Map("price" -> col("s.price"),
          "tag" -> col("s.tag")))
        .whenNotMatchedInsertAll()
        .execute()
      val v = table.deltaLog.update().version
      val ch = table.changes(v, v)
        .select($"id", $"tag", $"_change_type").as[(Int, Option[String], String)]
        .collect().toSet
      // postimage and insert carry the evolved column; the preimage
      // predates it and reads null
      assert(ch.contains((2, Some("t2"), "update_postimage")), ch.toString)
      assert(ch.contains((2, None, "update_preimage")), ch.toString)
      assert(ch.contains((4, Some("t4"), "insert")), ch.toString)
    }
  }

  test("identity and generated columns assign together on one table") {
    withTempDir { dir =>
      val schema = StructType(Seq(
        StructField("row_id", LongType),
        StructField("ts", TimestampType),
        StructField("day", StringType)))
      DeltaTable.create(spark, dir, schema,
        partitionBy = Seq("day"),
        generatedColumns = Map("day" -> "date_format(ts, 'yyyy-MM-dd')"),
        identityColumns = Map("row_id" -> ((1L, 1L))))
      // identity implies writer 6 (superset of generated's 4)
      assert(DeltaLog.forTable(spark, dir).update()
        .protocol.minWriterVersion == 6)
      DeltaTable.write(
        Seq(java.sql.Timestamp.valueOf("2026-01-01 10:00:00"),
          java.sql.Timestamp.valueOf("2026-01-02 09:00:00")).toDF("ts"), dir)
      val out = DeltaTable.forPath(spark, dir).toDF
        .select($"row_id", $"day").as[(Long, String)].collect().toSeq
      assert(out.map(_._1).distinct.size == 2 && out.forall(_._1 >= 1L))
      assert(out.map(_._2).sorted == Seq("2026-01-01", "2026-01-02"))
      // the generated partition column still prunes
      val scan = DeltaTable.forPath(spark, dir).scan($"day" === "2026-01-01")
      assert(scan.getFiles.size == 1)
    }
  }

  test("compact splits an oversized NULL partition (salting join on null)") {
    withTempDir { dir =>
      // one real partition value and one NULL partition, both oversized
      // for a tiny target: the broadcast (partitionValues -> bins) join
      // must match the null partition via null-safe equality
      (1 to 6).foreach { i =>
        DeltaTable.write(
          (1 to 40).map(j => (i * 1000 + j,
            if (j % 2 == 0) "a" else null)).toDF("v", "grp").coalesce(1),
          dir, partitionBy = if (i == 1) Seq("grp") else Nil)
      }
      val log = DeltaLog.forTable(spark, dir)
      val before = log.update()
      assert(before.allFiles.size == 12) // 6 commits × 2 partitions
      val expected = before.toDF.as[(Int, Option[String])].collect().toSet
      val total = before.allFiles.map(_.size).sum
      DeltaTable.forPath(spark, dir).compact(targetFileBytes = total / 4)
      val after = log.update()
      assert(after.allFiles.size < 12, s"${after.allFiles.size} files")
      assert(after.toDF.as[(Int, Option[String])].collect().toSet == expected)
      // null-partition rows intact and pruned-readable
      assert(after.toDF.filter($"grp".isNull).count() == 120)
    }
  }

  test("CDF range read on a column-mapped (renamed) table decodes " +
      "logical names") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh-cdf-").toFile
    spark.conf.set("spark.sql.catalog.graftcdf", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftcdf.warehouse", wh.getAbsolutePath)
    spark.sql("""CREATE TABLE graftcdf.db.c (id INT, amount DOUBLE)
                 TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')""")
    spark.sql("INSERT INTO graftcdf.db.c VALUES (1, 10.0), (2, 20.0)")
    spark.sql("ALTER TABLE graftcdf.db.c RENAME COLUMN amount TO price")
    spark.sql("UPDATE graftcdf.db.c SET price = 99.0 WHERE id = 2")
    val path = s"${wh.getAbsolutePath}/db/c"
    val table = DeltaTable.forPath(spark, path)
    val endV = table.deltaLog.update().version
    val ch = table.changes(0, endV)
      .select($"id", $"price", $"_change_type").as[(Int, Double, String)]
      .collect().toSet
    assert(ch.contains((1, 10.0, "insert")), ch.toString)
    assert(ch.contains((2, 20.0, "update_preimage")), ch.toString)
    assert(ch.contains((2, 99.0, "update_postimage")), ch.toString)
  }

  test("conditional merge on a column-mapped (renamed) table") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh-").toFile
    spark.conf.set("spark.sql.catalog.graftc", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftc.warehouse", wh.getAbsolutePath)
    spark.sql("CREATE TABLE graftc.db.cmm (id INT, amount DOUBLE)")
    spark.sql("INSERT INTO graftc.db.cmm VALUES (1, 10.0), (2, 20.0)")
    spark.sql("ALTER TABLE graftc.db.cmm RENAME COLUMN amount TO price")
    spark.sql("""MERGE INTO graftc.db.cmm AS tgt
                 USING (SELECT 2 AS id, 99.0 AS price
                        UNION ALL SELECT 3, 30.0) AS src
                 ON tgt.id = src.id
                 WHEN MATCHED AND src.price > 50 THEN UPDATE SET price = src.price
                 WHEN NOT MATCHED THEN INSERT (id, price) VALUES (src.id, src.price)""")
    val rows = spark.sql("SELECT id, price FROM graftc.db.cmm ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1, 10.0), (2, 99.0), (3, 30.0)), rows.toString)
  }
}
