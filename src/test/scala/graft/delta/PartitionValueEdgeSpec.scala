package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SURVEY §7 risk register: partition-value serialization edge cases
  * (escaped chars, null vs "null", typed partition values) — the cases the
  * reference covers with the data-reader-partition-values /
  * data-reader-escaped-chars golden tables. */
class PartitionValueEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("partition values with spaces, equals, unicode and colons round-trip") {
    withTempDir { dir =>
      val values = Seq("plain", "with space", "a=b", "c:d", "täst-ünïcode", "100%")
      val df = values.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "part")
      DeltaTable.write(df, dir, partitionBy = Seq("part"))
      val back = DeltaTable.forPath(spark, dir).toDF
        .select($"id", $"part").as[(Int, String)].collect().toMap
      assert(back == values.zipWithIndex.map(_.swap).toMap)
      // pruning still works on the escaped values
      val one = DeltaTable.forPath(spark, dir).toDF
        .filter($"part" === "with space").select($"id").as[Int].collect()
      assert(one.toSeq == Seq(1))
      val scan = DeltaTable.forPath(spark, dir).scan($"part" === "a=b")
      assert(scan.getFiles.size == 1)
    }
  }

  test("null partition value vs the string 'null' stay distinct") {
    withTempDir { dir =>
      val df = Seq((1, null: String), (2, "null"), (3, "x")).toDF("id", "part")
      DeltaTable.write(df, dir, partitionBy = Seq("part"))
      val files = DeltaLog.forTable(spark, dir).update().allFiles
      // the log records a JSON null for the missing value, not "null"
      assert(files.exists(_.partitionValues("part") == null))
      assert(files.exists(_.partitionValues("part") == "null"))
      val back = DeltaTable.forPath(spark, dir).toDF
      assert(back.filter($"part".isNull).select($"id").as[Int].collect().toSeq == Seq(1))
      assert(back.filter($"part" === "null").select($"id").as[Int].collect().toSeq == Seq(2))
    }
  }

  test("typed partition values: int, date and boolean decode per protocol") {
    withTempDir { dir =>
      val df = Seq(
        (1, 10, java.sql.Date.valueOf("2023-05-01"), true),
        (2, 20, java.sql.Date.valueOf("2023-06-01"), false))
        .toDF("id", "bucket", "day", "flag")
      DeltaTable.write(df, dir, partitionBy = Seq("bucket", "day", "flag"))
      val t = DeltaTable.forPath(spark, dir).toDF
      assert(t.schema("bucket").dataType == org.apache.spark.sql.types.IntegerType)
      assert(t.schema("day").dataType == org.apache.spark.sql.types.DateType)
      assert(t.filter($"bucket" === 10 && $"flag").select($"id").as[Int].collect().toSeq == Seq(1))
      assert(t.filter($"day" >= "2023-05-15").select($"id").as[Int].collect().toSeq == Seq(2))
      // pruning happens on the typed comparison, not string compare
      val scan = DeltaTable.forPath(spark, dir).scan($"day" < "2023-06-01")
      assert(scan.getFiles.size == 1)
    }
  }

  test("timestamp partition values survive a UTC round-trip") {
    withTempDir { dir =>
      val df = Seq(
        (1, java.sql.Timestamp.valueOf("2023-05-01 10:30:00")),
        (2, java.sql.Timestamp.valueOf("2023-05-01 22:45:30")))
        .toDF("id", "ts")
      DeltaTable.write(df, dir, partitionBy = Seq("ts"))
      val back = DeltaTable.forPath(spark, dir).toDF
        .select($"id", $"ts").as[(Int, java.sql.Timestamp)].collect().toMap
      assert(back(1) == java.sql.Timestamp.valueOf("2023-05-01 10:30:00"))
      assert(back(2) == java.sql.Timestamp.valueOf("2023-05-01 22:45:30"))
    }
  }

  test("MERGE updates rows in partitions whose paths need URI encoding") {
    withTempDir { dir =>
      // 'with space' makes the data-file path differ between Path.toString
      // (decoded) and input_file_name()'s URI spelling — a mismatch here
      // silently skips the file and the update is lost
      val df = Seq((1, "with space", 10.0), (2, "plain", 20.0), (3, "täst ü", 30.0))
        .toDF("id", "part", "price")
      DeltaTable.write(df, dir, partitionBy = Seq("part"))
      val source = Seq((1, 99.0), (3, 77.0), (4, 44.0)).toDF("id", "new_price")
      DeltaTable.forPath(spark, dir)
        .merge(source, col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("price" -> col("s.new_price")))
        .whenNotMatchedInsertAll()
        .execute()
      val back = DeltaTable.forPath(spark, dir).toDF
        .select($"id", $"price").collect()
        .map(r => r.getInt(0) -> Option(r.get(1))).toMap
      assert(back.keySet == Set(1, 2, 3, 4))
      assert(back(1).contains(99.0) && back(3).contains(77.0),
        "updates in URI-encoded partitions lost")
      assert(back(2).contains(20.0))
    }
  }

  test("percent-encoded file paths in the log resolve to the right files") {
    withTempDir { dir =>
      // partition dirs with characters hive escapes (%xx in the path)
      val df = Seq((1, "a b"), (2, "x%y")).toDF("id", "part")
      DeltaTable.write(df, dir, partitionBy = Seq("part"))
      val files = DeltaLog.forTable(spark, dir).update().allFiles
      files.foreach { f =>
        // stored as a relative URI: decodable, and the decoded path exists
        val decoded = new java.net.URI(f.path).getPath
        val full = new org.apache.hadoop.fs.Path(dir + "/" + decoded)
        val fs = full.getFileSystem(spark.sessionState.newHadoopConf())
        assert(fs.exists(full), s"missing $full for AddFile ${f.path}")
      }
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 2)
    }
  }
}
