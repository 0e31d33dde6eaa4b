package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: matched rows update, unmatched rows insert") {
    withTempDir { dir =>
      DeltaTable.write((1 to 10).map(i => (i, i * 10.0)).toDF("id", "price"), dir)
      val source = (6 to 15).map(i => (i, i * 100.0)).toDF("id", "price")
      val table = DeltaTable.forPath(spark, dir)
      table.merge(source, col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("price" -> col("s.price")))
        .whenNotMatchedInsertAll()
        .execute()

      val out = table.toDF.as[(Int, Double)].collect().toMap
      assert(out.keySet == (1 to 15).toSet)
      (1 to 5).foreach(i => assert(out(i) == i * 10.0)) // untouched
      (6 to 15).foreach(i => assert(out(i) == i * 100.0)) // updated/inserted
      assert(table.history().filter($"operation" === "MERGE").count() == 1)
    }
  }

  test("whenMatchedDelete removes matched target rows") {
    withTempDir { dir =>
      DeltaTable.write((1 to 10).toDF("id"), dir)
      val table = DeltaTable.forPath(spark, dir)
      table.merge(Seq(2, 4, 6).toDF("id"), col("t.id") === col("s.id"))
        .whenMatchedDelete()
        .execute()
      assert(table.toDF.as[Int].collect().sorted.toSeq ==
        Seq(1, 3, 5, 7, 8, 9, 10))
    }
  }

  test("a target row matched by two source rows is an error") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "x")).toDF("id", "v"), dir)
      val dupSource = Seq((1, "a"), (1, "b")).toDF("id", "v")
      val table = DeltaTable.forPath(spark, dir)
      intercept[IllegalStateException] {
        table.merge(dupSource, col("t.id") === col("s.id"))
          .whenMatchedUpdate(Map("v" -> col("s.v")))
          .execute()
      }
      assert(table.toDF.count() == 1) // nothing committed
    }
  }

  test("insert-only merge appends exactly the unmatched rows") {
    withTempDir { dir =>
      DeltaTable.write((1 to 5).map(i => (i, s"g${i % 2}")).toDF("id", "grp"),
        dir, partitionBy = Seq("grp"))
      val filesBefore = DeltaLog.forTable(spark, dir).update().allFiles.map(_.path).toSet
      val source = (4 to 8).map(i => (i, s"g${i % 2}")).toDF("id", "grp")
      val table = DeltaTable.forPath(spark, dir)
      table.merge(source, col("t.id") === col("s.id"))
        .whenNotMatchedInsertAll()
        .execute()
      assert(table.toDF.select($"id").as[Int].collect().sorted.toSeq ==
        (1 to 8).toSeq)
      // no target file was rewritten — insert-only merges never remove
      val after = DeltaLog.forTable(spark, dir).update().allFiles.map(_.path).toSet
      assert(filesBefore.subsetOf(after))
    }
  }
}
