package graft.delta

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Assertions on the PLANS our scans produce — the properties that decide
  * 100 TB behavior: data filters pushed to the parquet scan, read schema
  * pruned to referenced columns, partition filters not re-read as data. */
class PlanQualitySpec extends SparkSpec {
  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))

  test("data filters reach the parquet scan as PushedFilters") {
    withTempDir { dir =>
      DeltaTable.write(
        (1 to 1000).map(i => (i.toLong, s"c$i", i * 1.5)).toDF("id", "name", "score"),
        dir)
      val q = DeltaTable.forPath(spark, dir).toDF.filter($"id" > 500L && $"score" < 100.0)
      val scan = scanOf(q)
      val pushed = scan.metadata("PushedFilters")
      assert(pushed.contains("GreaterThan(id,500)"), s"pushed=$pushed")
      assert(pushed.contains("LessThan(score,100.0)"), s"pushed=$pushed")
    }
  }

  test("projection prunes the parquet read schema") {
    withTempDir { dir =>
      DeltaTable.write(
        (1 to 100).map(i => (i, s"n$i", i * 1.0, s"x$i")).toDF("a", "b", "c", "d"),
        dir)
      val q = DeltaTable.forPath(spark, dir).toDF.select($"a", $"c")
      val schema = scanOf(q).metadata("ReadSchema")
      assert(schema.contains("a:int") && schema.contains("c:double"), schema)
      assert(!schema.contains("b:") && !schema.contains("d:"), schema)
    }
  }

  test("partition predicates prune files and never appear as data filters") {
    withTempDir { dir =>
      DeltaTable.write(
        (1 to 100).map(i => (i, s"g${i % 5}")).toDF("v", "grp"),
        dir, partitionBy = Seq("grp"))
      val q = DeltaTable.forPath(spark, dir).toDF.filter($"grp" === "g3")
      q.collect()
      val scan = scanOf(q)
      assert(scan.partitionFilters.nonEmpty)
      assert(scan.dataFilters.isEmpty,
        s"partition filter leaked into data filters: ${scan.dataFilters}")
      val selected = scan.relation.location
        .listFiles(scan.partitionFilters, Nil)
      assert(selected.map(_.files.length).sum ==
        DeltaLog.forTable(spark, dir).update().allFiles
          .count(_.partitionValues("grp") == "g3"))
    }
  }

  test("SQL functions registered through GraftExtensions evaluate") {
    // a child session so the registration doesn't leak into other suites
    val s2 = spark.newSession()
    graft.GraftExtensions.register(s2)
    val out = s2.sql(
      """SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       sorted_array_jaccard(array('a','b'), array('b','c')) AS j
        |""".stripMargin).collect().head
    assert(out.getDouble(0) == 11.0)
    assert(math.abs(out.getDouble(1) - 1.0 / 3.0) < 1e-12)
  }
}
