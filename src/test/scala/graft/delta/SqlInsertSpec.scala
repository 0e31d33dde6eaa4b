package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SQL INSERT must flow through the transaction log, never Spark's raw
  * file-write fallback (which would add unregistered files, or clobber
  * the table dir on overwrite). */
class SqlInsertSpec extends SparkSpec {
  import spark.implicits._

  test("INSERT INTO a graft-delta view commits transactionally") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "a"), (2, "b")).toDF("id", "name"), dir)
      spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW t_ins
                    USING `graft-delta` OPTIONS (path '$dir')""")
      try {
        val v0 = DeltaLog.forTable(spark, dir).update().version
        spark.sql("INSERT INTO t_ins VALUES (3, 'c'), (4, 'd')")
        val log = DeltaLog.forTable(spark, dir)
        assert(log.update().version == v0 + 1, "insert must commit to the log")
        assert(log.getCommitInfoAt(v0 + 1).operation.contains("WRITE"))
        // the view itself reflects the insert on re-read
        assert(spark.sql("SELECT COUNT(*) FROM t_ins").as[Long].head() == 2,
          "view pins its snapshot (reads are repeatable)")
        assert(DeltaTable.forPath(spark, dir).toDF.count() == 4)
      } finally spark.catalog.dropTempView("t_ins")
    }
  }

  test("INSERT INTO a partitioned view routes through the log too") {
    withTempDir { dir =>
      DeltaTable.write((1 to 10).map(i => (i, s"g${i % 2}")).toDF("v", "grp"),
        dir, partitionBy = Seq("grp"))
      spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW t_part
                    USING `graft-delta` OPTIONS (path '$dir')""")
      try {
        val v0 = DeltaLog.forTable(spark, dir).update().version
        spark.sql("INSERT INTO t_part VALUES (11, 'g1')")
        val log = DeltaLog.forTable(spark, dir)
        assert(log.update().version == v0 + 1)
        assert(DeltaTable.forPath(spark, dir).toDF.count() == 11)
        // the new file carries log-supplied partition values
        val added = log.getChanges(v0 + 1).next()._2
          .collect { case a: AddFile => a }
        assert(added.forall(_.partitionValues.keySet == Set("grp")))
        // static PARTITION clauses are rejected, not silently rerouted
        intercept[Exception] {
          spark.sql("INSERT INTO t_part PARTITION (grp='g1') VALUES (12)")
        }
      } finally spark.catalog.dropTempView("t_part")
    }
  }

  test("positional INSERT aligns to the DECLARED order when the " +
      "partition column is not declared last") {
    withTempDir { dir =>
      // declared (id, day, value), partitioned by the MIDDLE column: the
      // scan relation reorders to (id, value, day) — VALUES must still
      // map by declared position
      DeltaTable.write(
        Seq((1L, "2026-01-01", "a")).toDF("id", "day", "value"),
        dir, partitionBy = Seq("day"))
      spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW t_mid
                    USING `graft-delta` OPTIONS (path '$dir')""")
      try {
        spark.sql("INSERT INTO t_mid VALUES (2, '2026-01-02', 'b')")
        val got = DeltaTable.forPath(spark, dir).toDF
          .select($"id", $"day", $"value").as[(Long, String, String)]
          .collect().toSet
        assert(got == Set((1L, "2026-01-01", "a"), (2L, "2026-01-02", "b")),
          got.toString)
      } finally spark.catalog.dropTempView("t_mid")
    }
  }

  test("INSERT OVERWRITE replaces the table through the log") {
    withTempDir { dir =>
      DeltaTable.write((1 to 10).map(i => (i, s"g${i % 2}")).toDF("v", "grp"),
        dir, partitionBy = Seq("grp"))
      spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW t_ovr
                    USING `graft-delta` OPTIONS (path '$dir')""")
      try {
        spark.sql("INSERT OVERWRITE t_ovr VALUES (99, 'g9')")
        val log = DeltaLog.forTable(spark, dir)
        DeltaLog.clearCache()
        val table = DeltaTable.forPath(spark, dir)
        assert(table.toDF.count() == 1)
        assert(table.toDF.select($"v").as[Int].head() == 99)
        // log intact: history survives, tombstones recorded
        assert(log.update().tombstones.nonEmpty)
        assert(table.history().count() >= 2)
      } finally spark.catalog.dropTempView("t_ovr")
    }
  }
}
