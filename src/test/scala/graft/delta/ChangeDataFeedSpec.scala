package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChangeDataFeedSpec extends SparkSpec {
  import spark.implicits._

  private val cdf = Map("delta.enableChangeDataFeed" -> "true")

  test("inserts, updates and deletes all appear in the change feed") {
    withTempDir { dir =>
      DeltaTable.write((1 to 4).map(i => (i, i * 1.0)).toDF("id", "v"), dir,
        configuration = cdf)                                   // v0: insert x4
      DeltaTable.write(Seq((5, 5.0)).toDF("id", "v"), dir)     // v1: insert x1
      val table = DeltaTable.forPath(spark, dir)
      table.update($"id" === 2, Map("v" -> lit(-2.0)))         // v2: pre+post
      table.delete($"v" > 4.0)                                 // v3: delete id 5

      val feed = table.changes(0, 3)
        .select($"id", $"v", col("_change_type"), col("_commit_version"))
        .as[(Int, Double, String, Long)].collect().toSet
      assert(feed.count(_._3 == "insert") == 5)
      assert(feed.contains((2, 2.0, "update_preimage", 2L)))
      assert(feed.contains((2, -2.0, "update_postimage", 2L)))
      assert(feed.contains((5, 5.0, "delete", 3L)))
      // windowed read
      assert(table.changes(2, 2).count() == 2)
    }
  }

  test("metadata-only partition delete derives full-row deletes") {
    withTempDir { dir =>
      DeltaTable.write((1 to 10).map(i => (i, s"g${i % 2}")).toDF("v", "grp"),
        dir, partitionBy = Seq("grp"), configuration = cdf)
      val table = DeltaTable.forPath(spark, dir)
      table.deleteWhere($"grp" === "g0") // v1, no files rewritten
      val deleted = table.changes(1, 1)
        .filter(col("_change_type") === "delete")
        .select($"v").as[Int].collect().sorted.toSeq
      assert(deleted == Seq(2, 4, 6, 8, 10))
    }
  }

  test("merge records update, delete and insert changes") {
    withTempDir { dir =>
      DeltaTable.write((1 to 5).map(i => (i, i * 10.0)).toDF("id", "p"), dir,
        configuration = cdf)
      val table = DeltaTable.forPath(spark, dir)
      table.merge((4 to 7).map(i => (i, i * 100.0)).toDF("id", "p"),
          col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("p" -> col("s.p")))
        .whenNotMatchedInsertAll()
        .execute() // v1
      val feed = table.changes(1, 1)
        .select($"id", $"p", col("_change_type"))
        .as[(Int, Double, String)].collect().toSet
      assert(feed.contains((4, 40.0, "update_preimage")))
      assert(feed.contains((4, 400.0, "update_postimage")))
      assert(feed.contains((5, 50.0, "update_preimage")))
      assert(feed.contains((6, 600.0, "insert")))
      assert(feed.contains((7, 700.0, "insert")))
    }
  }

  test("rewrite commits without change files refuse a CDF read") {
    withTempDir { dir =>
      DeltaTable.write((1 to 10).map(i => (i, i * 1.0)).toDF("id", "v"), dir)
      val table = DeltaTable.forPath(spark, dir)
      table.delete($"id" > 8) // rewrite without CDC (feed disabled)
      intercept[UnsupportedOperationException] {
        table.changes(0, table.version).collect()
      }
      // plain insert ranges still readable
      assert(table.changes(0, 0).count() == 10)
    }
  }
}
