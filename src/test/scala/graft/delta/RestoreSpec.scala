package graft.delta

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RestoreSpec extends SparkSpec {
  import spark.implicits._

  test("restore rewinds content as a new commit and keeps history") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), dir,
        SaveMode.Overwrite)                                   // v0
      DeltaTable.write(Seq((3, "c")).toDF("id", "v"), dir)    // v1
      DeltaTable.write(Seq((9, "z")).toDF("id", "v"), dir,
        SaveMode.Overwrite)                                   // v2: drops all
      val table = DeltaTable.forPath(spark, dir)

      val committed = table.restore(1)
      assert(committed == 3)
      assert(table.toDF.as[(Int, String)].collect().toSet ==
        Set((1, "a"), (2, "b"), (3, "c")))
      // history records the op; the overwritten version stays travelable
      assert(table.history().filter($"operation" === "RESTORE").count() == 1)
      assert(table.asOfVersion(2).as[(Int, String)].collect().toSet ==
        Set((9, "z")))
      // restore FORWARD to the overwrite works too (it is just a diff)
      table.restore(2)
      assert(table.toDF.as[(Int, String)].collect().toSet == Set((9, "z")))
      // no-op restore to the current version returns without a commit
      val v = table.version
      assert(table.restore(v) == v)
      assert(table.version == v)
    }
  }

  test("restore brings back the target version's metadata") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "a")).toDF("id", "v"), dir, SaveMode.Overwrite)
      DeltaTable.write(Seq((2, "b", 7.5)).toDF("id", "v", "score"),
        dir)                                                  // v1 widens
      val table = DeltaTable.forPath(spark, dir)
      assert(table.toDF.columns.contains("score"))

      table.restore(0)
      val cols = table.toDF.columns.toSeq
      assert(cols == Seq("id", "v"), s"schema not restored: $cols")
      assert(table.toDF.as[(Int, String)].collect().toSet == Set((1, "a")))
    }
  }

  test("restore fails when the target's files were vacuumed away") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "a")).toDF("id", "v"), dir, SaveMode.Overwrite)
      DeltaTable.write(Seq((9, "z")).toDF("id", "v"), dir,
        SaveMode.Overwrite)                                   // v1 tombstones v0
      val log = DeltaLog.forTable(spark, dir)
      log.clock = () => System.currentTimeMillis() + 8L * 24 * 3600 * 1000
      val table = DeltaTable.forPath(spark, dir)
      assert(table.vacuum() > 0)

      val e = intercept[IllegalArgumentException] { table.restore(0) }
      assert(e.getMessage.contains("VACUUM"))
      // the failed restore did not commit anything
      assert(table.version == 1)
    }
  }

  test("restore on a CDF table records delete+insert images") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "a")).toDF("id", "v"), dir, SaveMode.Overwrite,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      DeltaTable.write(Seq((9, "z")).toDF("id", "v"), dir, SaveMode.Overwrite)
      val table = DeltaTable.forPath(spark, dir)
      val v = table.restore(0)
      val changes = table.changes(v, v)
        .select($"id", col(write.CdcWriter.ChangeTypeCol))
        .as[(Int, String)].collect().toSet
      assert(changes == Set((1, "insert"), (9, "delete")), changes.toString)
    }
  }

  test("restore to timestamp resolves through the commit timeline") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "a")).toDF("id", "v"), dir, SaveMode.Overwrite)
      DeltaTable.write(Seq((9, "z")).toDF("id", "v"), dir, SaveMode.Overwrite)
      val log = DeltaLog.forTable(spark, dir)
      // the commit TIMELINE (monotonized mtimes), not the clock, defines
      // timestamp resolution — read both versions' effective timestamps
      val t0 = log.getSnapshotForVersionAsOf(0).timestamp
      val t1 = log.getSnapshotForVersionAsOf(1).timestamp
      assert(t1 > t0) // monotonization guarantees strict order
      val table = DeltaTable.forPath(spark, dir)

      table.restoreToTimestamp(t0) // at-or-before t0 → v0
      assert(table.toDF.as[(Int, String)].collect().toSet == Set((1, "a")))

      // SQL face with a timestamp literal resolving to v1
      val ts = new java.sql.Timestamp(t1).toString
      spark.sql(s"RESTORE TABLE '$dir' TO TIMESTAMP AS OF '$ts'")
      assert(table.toDF.as[(Int, String)].collect().toSet == Set((9, "z")))
    }
  }

  test("SQL RESTORE statement routes through the parser") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "a")).toDF("id", "v"), dir, SaveMode.Overwrite)
      DeltaTable.write(Seq((2, "b")).toDF("id", "v"), dir, SaveMode.Overwrite)
      val out = spark.sql(s"RESTORE TABLE '$dir' TO VERSION AS OF 0").collect()
      assert(out.head.getLong(2) == 2L)
      assert(DeltaTable.forPath(spark, dir).toDF
        .as[(Int, String)].collect().toSet == Set((1, "a")))
    }
  }
}
