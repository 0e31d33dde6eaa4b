package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The table-valued SQL surface (F9 SELECT remainder): time travel,
  * DESCRIBE HISTORY and the change feed reachable from pure SQL. */
class SqlTableFunctionSpec extends SparkSpec {
  import spark.implicits._

  test("graft_table serves latest and time-travel versions from SQL") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), dir)
      DeltaTable.write(Seq((3, "c")).toDF("id", "v"), dir)
      assert(spark.sql(s"SELECT COUNT(*) FROM graft_table('$dir')")
        .as[Long].head() == 3L)
      assert(spark.sql(s"SELECT COUNT(*) FROM graft_table('$dir', 0)")
        .as[Long].head() == 2L)
      // predicates over the TVF still prune/push down through the relation
      val ids = spark.sql(
        s"SELECT id FROM graft_table('$dir') WHERE v = 'c'").as[Int].collect()
      assert(ids.toSeq == Seq(3))
    }
  }

  test("graft_history lists commits newest-first with operations") {
    withTempDir { dir =>
      DeltaTable.write(Seq(1).toDF("v"), dir)
      DeltaTable.write(Seq(2).toDF("v"), dir)
      DeltaTable.forPath(spark, dir).delete($"v" === 1)
      val rows = spark.sql(
        s"""SELECT version, operation, is_blind_append
            FROM graft_history('$dir')""").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 1L, 0L))
      assert(rows.map(_.getString(1)).toSeq ==
        Seq("DELETE", "WRITE", "CREATE TABLE"))
      assert(rows.head.getBoolean(2) == false) // DELETE reads the table
      assert(rows.last.getBoolean(2) == true) // creation reads nothing
    }
  }

  test("DESCRIBE HISTORY statement: newest-first, full CommitInfo " +
      "surface, LIMIT honored") {
    withTempDir { dir =>
      DeltaTable.write(Seq(1).toDF("v"), dir)
      DeltaTable.write(Seq(2).toDF("v"), dir)
      DeltaTable.forPath(spark, dir).delete($"v" === 1)
      val rows = spark.sql(s"DESCRIBE HISTORY '$dir'").collect()
      assert(rows.map(_.getAs[Long]("version")).toSeq == Seq(2L, 1L, 0L))
      assert(rows.map(_.getAs[String]("operation")).toSeq ==
        Seq("DELETE", "WRITE", "CREATE TABLE"))
      // operationMetrics ride as a real MAP column
      val metrics = rows.head.getAs[Map[String, String]]("operationMetrics")
      assert(metrics != null && metrics.nonEmpty,
        s"DELETE must report operationMetrics: $metrics")
      val limited = spark.sql(s"DESC HISTORY '$dir' LIMIT 1").collect()
      assert(limited.length == 1 &&
        limited.head.getAs[Long]("version") == 2L)
    }
  }

  test("DESCRIBE DETAIL statement matches the detail() API") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "a"), (2, "b")).toDF("id", "part"), dir,
        partitionBy = Seq("part"))
      val viaSql = spark.sql(s"DESCRIBE DETAIL '$dir'").collect()
      val viaApi = DeltaTable.forPath(spark, dir).detail().collect()
      assert(viaSql.toSeq == viaApi.toSeq)
      assert(viaSql.length == 1)
    }
  }

  test("graft_table_changes streams the CDF columns from SQL") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), dir)
      DeltaTable.write(Seq((3, "c")).toDF("id", "v"), dir)
      val changed = spark.sql(
        s"""SELECT id, _change_type, _commit_version
            FROM graft_table_changes('$dir', 1, 1)""").collect()
      assert(changed.map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
        .toSeq == Seq((3, "insert", 1L)))
    }
  }

  test("graft_detail reports table metadata, file counts and protocol") {
    withTempDir { dir =>
      DeltaTable.write(
        Seq((1, "x"), (2, "y")).toDF("id", "part"),
        dir, partitionBy = Seq("part"),
        configuration = Map("custom.owner" -> "graft"))
      DeltaTable.forPath(spark, dir).addConstraint("id_pos", "id > 0")
      val row = spark.sql(s"SELECT * FROM graft_detail('$dir')").collect().head
      assert(row.getAs[String]("format") == "delta")
      assert(row.getAs[scala.collection.Seq[String]]("partition_columns")
        .toSeq == Seq("part"))
      assert(row.getAs[Long]("num_files") == 2L) // one per partition
      assert(row.getAs[Long]("size_in_bytes") > 0L)
      val props = row.getAs[Map[String, String]]("properties")
      assert(props("custom.owner") == "graft")
      assert(props("delta.constraints.id_pos") == "id > 0")
      assert(row.getAs[Int]("min_writer_version") == 3)
      // detail is metadata + two aggregated scalars — the full file list
      // was never folded on the driver for THIS call path in
      // distributed-state mode (covered by DistributedStateSpec's flag)
    }
  }

  test("graft_partitions lists per-partition files, bytes and rows") {
    withTempDir { dir =>
      DeltaTable.write(
        Seq((1, "a"), (2, "a"), (3, "b")).toDF("id", "part").coalesce(1),
        dir, partitionBy = Seq("part"))
      val rows = spark.sql(
        s"""SELECT part, num_files, num_rows FROM graft_partitions('$dir')
            ORDER BY part""").collect()
      assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
      assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 1L))
      assert(rows.map(_.getLong(2)).toSeq == Seq(2L, 1L))
      // unpartitioned tables refuse (same as SHOW PARTITIONS)
      withTempDir { flat =>
        DeltaTable.write(Seq(1).toDF("v"), flat)
        intercept[Exception] {
          spark.sql(s"SELECT * FROM graft_partitions('$flat')").collect()
        }
      }
    }
  }

  test("graft_table_changes accepts timestamp bounds") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "a")).toDF("id", "v"), dir)
      DeltaTable.write(Seq((2, "b")).toDF("id", "v"), dir)
      val log = DeltaLog.forTable(spark, dir)
      val t0 = new java.sql.Timestamp(
        log.getSnapshotForVersionAsOf(0).timestamp).toString
      val t1 = new java.sql.Timestamp(
        log.getSnapshotForVersionAsOf(1).timestamp).toString
      val rows = spark.sql(
        s"""SELECT id, _change_type, _commit_version
            FROM graft_table_changes('$dir', '$t0', '$t1')
            ORDER BY id""").collect()
      assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2))
      assert(rows.forall(_.getString(1) == "insert"))
      assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 1L))
      // half-open in time: starting after v0's commit excludes it
      val later = spark.sql(
        s"""SELECT id FROM graft_table_changes('$dir', '$t1', '$t1')""")
        .collect()
      assert(later.map(_.getInt(0)).toSeq == Seq(2))
    }
  }

  test("non-literal and mis-typed arguments fail at analysis") {
    withTempDir { dir =>
      DeltaTable.write(Seq(1).toDF("v"), dir)
      intercept[Exception] {
        spark.sql("SELECT * FROM graft_table('/nope/missing')").collect()
      }
      intercept[Exception] {
        spark.sql(s"SELECT * FROM graft_table('$dir', 0, 1, 2)").collect()
      }
    }
  }
}
