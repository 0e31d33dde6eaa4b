package graft.delta

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental liquid clustering: a clustering-domain OPTIMIZE stamps
  * its output with the columns it clustered on (+ a ZCube id); the next
  * OPTIMIZE rewrites only files WITHOUT a matching stamp — new appends,
  * files clustered on old columns after ALTER CLUSTER BY, DV-shaded
  * files. At 100 TB the steady-state cost of OPTIMIZE must track new
  * data, not table size. Explicit ZORDER BY keeps rewrite-everything. */
class LiquidClusteringIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def lastOptimizeMetrics(dir: String): Map[String, String] = {
    DeltaLog.clearCache()
    DeltaLog.forTable(spark, dir).history()
      .find(_.operation.contains("OPTIMIZE"))
      .flatMap(_.operationMetrics).getOrElse(Map.empty)
  }

  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }
    scan.map(s => s.relation.location
      .listFiles(s.partitionFilters, s.dataFilters)
      .map(_.files.length.toLong).sum).getOrElse(-1L)
  }

  private def clusteredData = spark.range(0, 4096).select(
    (col("id") % 64).as("a"),
    ((col("id") / 64).cast("long") % 64).as("b"),
    col("id").as("payload"))

  test("second OPTIMIZE rewrites only files added between them; skipping holds") {
    withTempDir { dir =>
      DeltaTable.write(clusteredData.repartition(8), dir)
      val table = DeltaTable.forPath(spark, dir)
      table.setClusteringColumns(Seq("a", "b"))
      val totalBytes = DeltaLog.forTable(spark, dir).update().sizeInBytes
      val target = totalBytes / 8 + 1

      table.compact(targetFileBytes = target)
      val m1 = lastOptimizeMetrics(dir)
      assert(m1("numRemovedFiles").toInt == 8,
        s"first pass clusters everything: $m1")
      // every live file now carries the stamp
      val snap1 = DeltaLog.forTable(spark, dir).update()
      assert(snap1.allFiles.forall(_.tags.exists(t =>
        t.get(DeltaTable.ClusteringColumnsTag).contains("a,b") &&
          t.contains(DeltaTable.ZCubeIdTag))))

      // OPTIMIZE with nothing new: a no-op, not a rewrite
      val vBefore = snap1.version
      table.compact(targetFileBytes = target)
      assert(DeltaLog.forTable(spark, dir).update().version == vBefore,
        "fully-clustered table must not rewrite")

      // two new appends; the second pass rewrites ONLY them
      DeltaTable.write(clusteredData.limit(100).repartition(1), dir)
      DeltaTable.write(clusteredData.limit(100).repartition(1), dir)
      table.compact(targetFileBytes = target)
      val m2 = lastOptimizeMetrics(dir)
      assert(m2("numRemovedFiles").toInt == 2,
        s"second pass must touch only the new files: $m2")

      // skipping still effective on BOTH clustering columns
      DeltaLog.clearCache()
      val t2 = DeltaTable.forPath(spark, dir)
      assert(t2.toDF.count() == 4096 + 200)
      val nFiles = DeltaLog.forTable(spark, dir).update().numOfFiles
      val point = t2.toDF.filter($"a" === 33L && $"b" === 44L)
      assert(point.count() == 1)
      assert(filesRead(point) * 2 <= nFiles,
        s"point predicate should prune: ${filesRead(point)} of $nFiles files")
    }
  }

  test("ALTER CLUSTER BY invalidates old stamps: next pass re-clusters all") {
    withTempDir { dir =>
      DeltaTable.write(clusteredData.repartition(6), dir)
      val table = DeltaTable.forPath(spark, dir)
      table.setClusteringColumns(Seq("a", "b"))
      val target = DeltaLog.forTable(spark, dir).update().sizeInBytes / 6 + 1
      table.compact(targetFileBytes = target)
      val n1 = DeltaLog.forTable(spark, dir).update().numOfFiles
      // re-declare DIFFERENT clustering columns: stamps no longer match
      table.setClusteringColumns(Seq("b"))
      table.compact(targetFileBytes = target)
      val m = lastOptimizeMetrics(dir)
      assert(m("numRemovedFiles").toInt == n1.toInt,
        s"changed clustering columns must re-cluster everything: $m")
      assert(DeltaLog.forTable(spark, dir).update().allFiles.forall(
        _.tags.exists(_.get(DeltaTable.ClusteringColumnsTag).contains("b"))))
    }
  }

  test("DV-shaded clustered files re-cluster and purge their shades") {
    withTempDir { dir =>
      DeltaTable.write(clusteredData.repartition(4), dir,
        configuration = Map("delta.enableDeletionVectors" -> "true"))
      val table = DeltaTable.forPath(spark, dir)
      table.setClusteringColumns(Seq("a", "b"))
      val target = DeltaLog.forTable(spark, dir).update().sizeInBytes / 4 + 1
      table.compact(targetFileBytes = target)
      table.delete($"a" === 5L && $"b" === 5L) // shades one clustered file
      val shaded = DeltaLog.forTable(spark, dir).update().allFiles
        .count(_.deletionVector.isDefined)
      assert(shaded >= 1)
      table.compact(targetFileBytes = target)
      val m = lastOptimizeMetrics(dir)
      assert(m("numRemovedFiles").toInt == shaded,
        s"pass must rewrite exactly the shaded files: $m")
      val snap = DeltaLog.forTable(spark, dir).update()
      assert(snap.allFiles.forall(_.deletionVector.isEmpty),
        "shades must purge")
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 4095)
    }
  }

  test("OPTIMIZE FULL forces a whole-table re-cluster past the stamps") {
    withTempDir { dir =>
      DeltaTable.write(clusteredData.repartition(6), dir)
      val table = DeltaTable.forPath(spark, dir)
      table.setClusteringColumns(Seq("a", "b"))
      val target = DeltaLog.forTable(spark, dir).update().sizeInBytes / 6 + 1
      table.compact(targetFileBytes = target)
      DeltaTable.write(clusteredData.limit(50).repartition(1), dir)
      table.compact(targetFileBytes = target)
      assert(lastOptimizeMetrics(dir)("numRemovedFiles").toInt == 1,
        "incremental pass touches only the new file")
      val nAll = DeltaLog.forTable(spark, dir).update().numOfFiles
      // the SQL FULL escape hatch rewrites everything, stamps included
      spark.sql(s"OPTIMIZE '$dir' FULL").collect()
      val m = lastOptimizeMetrics(dir)
      assert(m("numRemovedFiles").toInt == nAll.toInt,
        s"FULL must re-cluster every file: $m (had $nAll)")
      assert(DeltaLog.forTable(spark, dir).update().allFiles.forall(
        _.tags.exists(_.contains(DeltaTable.ZCubeIdTag))))
      // FULL + ZORDER BY is contradictory and refused
      intercept[IllegalArgumentException] {
        spark.sql(s"OPTIMIZE '$dir' FULL ZORDER BY (a)")
      }
    }
  }

  test("beyond the driver bound the stamp filter runs distributed") {
    withTempDir { dir =>
      spark.conf.set(Snapshot.DriverStateMaxBytesKey, "1")
      try {
        DeltaTable.write(clusteredData.repartition(4), dir,
          configuration = Map("delta.checkpointInterval" -> "1"))
        val table = DeltaTable.forPath(spark, dir)
        table.setClusteringColumns(Seq("a", "b"))
        DeltaLog.clearCache()
        val log = DeltaLog.forTable(spark, dir)
        assert(log.update().distributedState,
          "byte bound should force distributed state")
        val target = log.update().sizeInBytes / 4 + 1
        DeltaTable.forPath(spark, dir).compact(targetFileBytes = target)
        assert(lastOptimizeMetrics(dir)("numRemovedFiles").toInt == 4)
        // second pass: candidate selection (the tag filter) runs as a
        // Spark job over the distributed file list and finds nothing
        DeltaLog.clearCache()
        val log2 = DeltaLog.forTable(spark, dir)
        assert(log2.update().distributedState)
        val v = log2.update().version
        DeltaTable.forPath(spark, dir).compact(targetFileBytes = target)
        assert(DeltaLog.forTable(spark, dir).update().version == v,
          "fully-clustered table must no-op in distributed mode too")
      } finally spark.conf.unset(Snapshot.DriverStateMaxBytesKey)
    }
  }

  test("OPTIMIZE FULL on a non-clustered table is refused, not a silent bin-pack") {
    withTempDir { dir =>
      DeltaTable.write(clusteredData.repartition(2), dir)
      val e = intercept[IllegalArgumentException] {
        spark.sql(s"OPTIMIZE '$dir' FULL").collect()
      }
      assert(e.getMessage.contains("clustering columns"))
    }
  }

  test("ALTER TABLE ... CLUSTER BY DDL declares and clears clustering") {
    withTempDir { dir =>
      DeltaTable.write(clusteredData.repartition(4), dir)
      spark.sql(s"ALTER TABLE '$dir' CLUSTER BY (a, b)")
      val table = DeltaTable.forPath(spark, dir)
      assert(table.clusteringColumns == Seq("a", "b"))
      val target = DeltaLog.forTable(spark, dir).update().sizeInBytes / 4 + 1
      table.compact(targetFileBytes = target)
      assert(DeltaLog.forTable(spark, dir).update().allFiles.forall(
        _.tags.exists(_.get(DeltaTable.ClusteringColumnsTag).contains("a,b"))))
      spark.sql(s"ALTER TABLE '$dir' CLUSTER BY NONE")
      assert(DeltaTable.forPath(spark, dir).clusteringColumns.isEmpty)
      // back to plain bin-packing: the packed table no-ops
      val v = DeltaLog.forTable(spark, dir).update().version
      table.compact(targetFileBytes = target)
      assert(DeltaLog.forTable(spark, dir).update().version == v)
    }
  }

  test("explicit ZORDER BY still rewrites every file") {
    withTempDir { dir =>
      DeltaTable.write(clusteredData.repartition(5), dir)
      val table = DeltaTable.forPath(spark, dir)
      val target = DeltaLog.forTable(spark, dir).update().sizeInBytes / 5 + 1
      table.compact(targetFileBytes = target, zOrderBy = Seq("a", "b"))
      val n1 = DeltaLog.forTable(spark, dir).update().numOfFiles
      // a second explicit z-order: rewrite-everything contract holds
      table.compact(targetFileBytes = target, zOrderBy = Seq("a", "b"))
      val m = lastOptimizeMetrics(dir)
      assert(m("numRemovedFiles").toInt == n1.toInt,
        s"explicit ZORDER BY must rewrite all: $m")
    }
  }
}
