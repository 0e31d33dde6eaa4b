package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[graft.GraftExtensions.MetadataOnlyCount]]: COUNT(*)-only aggregates
  * over a bare Delta scan answer from AddFile stats — the plan must
  * carry NO file scan; anything that changes the visible row count
  * (filters, deletion vectors, missing stats) must keep the real scan
  * and the right answer. */
class MetadataCountSpec extends SparkSpec {
  import spark.implicits._

  private def hasScan(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("FileScan")

  test("count(*) answers from stats with no file scan") {
    withTempDir { dir =>
      DeltaTable.write((1 to 1000).toDF("v").repartition(4), dir)
      DeltaTable.write((1 to 500).toDF("v").repartition(2), dir)
      val df = DeltaTable.forPath(spark, dir).toDF.agg(count(lit(1)))
      assert(df.collect().head.getLong(0) == 1500L)
      assert(!hasScan(df),
        s"metadata count must not scan:\n${df.queryExecution.executedPlan}")
      // several counts in one aggregate all rewrite
      val multi = DeltaTable.forPath(spark, dir).toDF
        .agg(count(lit(1)).as("a"), count(lit(1)).as("b"))
      assert(multi.collect().head == org.apache.spark.sql.Row(1500L, 1500L))
      assert(!hasScan(multi))
      // SQL COUNT(*) through the TVF surface rewrites too
      val sql = spark.sql(s"SELECT COUNT(*) FROM graft_table('$dir')")
      assert(sql.collect().head.getLong(0) == 1500L)
      assert(!hasScan(sql))
    }
  }

  test("filters, other aggregates, and grouped counts keep the scan") {
    withTempDir { dir =>
      DeltaTable.write((1 to 100).toDF("v"), dir)
      val t = DeltaTable.forPath(spark, dir)
      val filtered = t.toDF.filter($"v" > 50).agg(count(lit(1)))
      assert(filtered.collect().head.getLong(0) == 50L)
      assert(hasScan(filtered), "a filter changes the count: must scan")
      val summed = t.toDF.agg(count(lit(1)), sum($"v"))
      assert(hasScan(summed), "a non-count aggregate needs the rows")
      assert(summed.collect().head.getLong(1) == 5050L)
      val grouped = t.toDF.groupBy(($"v" % 2).as("g")).agg(count(lit(1)))
      assert(hasScan(grouped), "grouping needs the rows")
    }
  }

  test("deletion vectors force the real scan and the shaded count") {
    withTempDir { dir =>
      DeltaTable.write((1 to 100).toDF("v").coalesce(1), dir,
        configuration = Map("delta.enableDeletionVectors" -> "true"))
      val t = DeltaTable.forPath(spark, dir)
      t.delete($"v" <= 10)
      val df = t.toDF.agg(count(lit(1)))
      assert(df.collect().head.getLong(0) == 90L,
        "shaded rows must not be counted")
      // purge restores the metadata-only path
      t.compact()
      val after = DeltaTable.forPath(spark, dir).toDF.agg(count(lit(1)))
      assert(after.collect().head.getLong(0) == 90L)
      assert(!hasScan(after), "post-purge stats are complete again")
    }
  }

  test("MIN/MAX/COUNT(col) answer from stats for safe types; nulls " +
      "respected") {
    withTempDir { dir =>
      val df = Seq[(java.lang.Long, java.lang.Integer, String)](
        (1L, 10, "a"), (2L, null, "b"), (3L, 30, null))
        .toDF("l", "i", "s")
      DeltaTable.write(df.repartition(2), dir)
      val t = DeltaTable.forPath(spark, dir)
      val agg = t.toDF.agg(min($"l"), max($"l"), min($"i"), max($"i"),
        count($"i"), count($"s"))
      assert(agg.collect().head ==
        org.apache.spark.sql.Row(1L, 3L, 10, 30, 2L, 2L))
      assert(!hasScan(agg),
        s"typed min/max must come from stats:\n${agg.queryExecution.executedPlan}")
    }
  }

  test("an all-null column yields null min/max without scanning") {
    withTempDir { dir =>
      val df = Seq[(Int, java.lang.Integer)]((1, null), (2, null))
        .toDF("v", "n")
      DeltaTable.write(df.coalesce(1), dir)
      val agg = DeltaTable.forPath(spark, dir).toDF.agg(min($"n"), max($"n"))
      assert(agg.collect().head == org.apache.spark.sql.Row(null, null))
      assert(!hasScan(agg))
    }
  }

  test("string and floating-point extrema keep the real scan") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "zz", 1.5), (2, "aa", 2.5))
        .toDF("v", "s", "d"), dir)
      val t = DeltaTable.forPath(spark, dir)
      val sAgg = t.toDF.agg(max($"s"))
      assert(sAgg.collect().head.getString(0) == "zz")
      assert(hasScan(sAgg),
        "parquet truncates binary stats: string max must scan")
      val dAgg = t.toDF.agg(max($"d"))
      assert(dAgg.collect().head.getDouble(0) == 2.5)
      assert(hasScan(dAgg), "float extrema interact with NaN: must scan")
    }
  }

  test("partition-only filters stay metadata-answerable; data filters " +
      "never do") {
    withTempDir { dir =>
      DeltaTable.write(
        (1 to 90).map(i => (i, s"p${i % 3}")).toDF("v", "part"), dir,
        partitionBy = Seq("part"))
      val t = DeltaTable.forPath(spark, dir)
      val one = t.toDF.filter($"part" === "p1").agg(count(lit(1)))
      assert(one.collect().head.getLong(0) == 30L)
      assert(!hasScan(one),
        s"partition-pruned count must not scan:\n${one.queryExecution.executedPlan}")
      // min/max of DATA columns under a partition filter
      val mm = t.toDF.filter($"part" === "p0")
        .agg(min($"v"), max($"v"), count(lit(1)))
      assert(mm.collect().head == org.apache.spark.sql.Row(3, 90, 30L))
      assert(!hasScan(mm))
      // a DATA-column predicate cannot be answered from partition values
      val dataPred = t.toDF.filter($"v" > 45).agg(count(lit(1)))
      assert(dataPred.collect().head.getLong(0) == 45L)
      assert(hasScan(dataPred))
      // mixed predicate: still a data reference -> scan
      val mixed = t.toDF.filter($"part" === "p1" && $"v" > 45)
        .agg(count(lit(1)))
      assert(mixed.collect().head.getLong(0) == 15L)
      assert(hasScan(mixed))
      // PARTITION columns answer from partitionValues — exact full
      // text, so even strings are safe here (unlike file stats)
      val partAgg = t.toDF.agg(min($"part"), max($"part"), count($"part"))
      assert(partAgg.collect().head ==
        org.apache.spark.sql.Row("p0", "p2", 90L))
      assert(!hasScan(partAgg),
        s"partition min/max must come from partitionValues:\n${partAgg.queryExecution.executedPlan}")
    }
  }

  test("null partition values: count skips them, min/max of all-null " +
      "partition column is null — all without scanning") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "a"), (2, null.asInstanceOf[String]))
        .toDF("v", "part"), dir, partitionBy = Seq("part"))
      val t = DeltaTable.forPath(spark, dir)
      val agg = t.toDF.agg(count($"part"), min($"part"))
      assert(agg.collect().head == org.apache.spark.sql.Row(1L, "a"))
      assert(!hasScan(agg))
      DeltaTable.forPath(spark, dir).deleteWhere($"part" === "a")
      val allNull = DeltaTable.forPath(spark, dir).toDF
        .agg(min($"part"), max($"part"), count($"part"))
      assert(allNull.collect().head ==
        org.apache.spark.sql.Row(null, null, 0L))
      assert(!hasScan(allNull))
    }
  }

  test("GROUP BY a partition column folds one metadata row per " +
      "partition; non-partition grouping scans") {
    withTempDir { dir =>
      DeltaTable.write(
        (1 to 90).map(i => (i, s"p${i % 3}")).toDF("v", "part")
          .repartition(4), dir, partitionBy = Seq("part"))
      val t = DeltaTable.forPath(spark, dir)
      val g = t.toDF.groupBy($"part")
        .agg(count(lit(1)).as("n"), min($"v").as("lo"), max($"v").as("hi"))
      val rows = g.collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3)))).toMap
      assert(rows == Map(
        "p0" -> ((30L, 3, 90)), "p1" -> ((30L, 1, 88)),
        "p2" -> ((30L, 2, 89))), s"got $rows")
      assert(!hasScan(g),
        s"partition group-by must fold from metadata:\n${g.queryExecution.executedPlan}")

      // a partition filter composes: only the surviving groups emit
      val filtered = t.toDF.filter($"part" =!= "p1")
        .groupBy($"part").agg(count(lit(1)).as("n"))
      assert(filtered.collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap ==
        Map("p0" -> 30L, "p2" -> 30L))
      assert(!hasScan(filtered))

      // grouping by a DATA column needs the rows
      val byData = t.toDF.groupBy(($"v" % 2).as("g")).agg(count(lit(1)))
      assert(hasScan(byData))
      // a data-column aggregate string min keeps the scan even grouped
      val strAgg = t.toDF.groupBy($"part").agg(max($"part"))
      assert(!hasScan(strAgg), "partition-col max per group is exact")
      assert(strAgg.collect().map(_.getString(1)).sorted.toSeq ==
        Seq("p0", "p1", "p2"))
    }
  }

  test("the kill switch restores the scanning plan") {
    withTempDir { dir =>
      DeltaTable.write((1 to 10).toDF("v"), dir)
      spark.conf.set("spark.graft.metadataCount.enabled", "false")
      try {
        val df = DeltaTable.forPath(spark, dir).toDF.agg(count(lit(1)))
        assert(df.collect().head.getLong(0) == 10L)
        assert(hasScan(df))
      } finally spark.conf.unset("spark.graft.metadataCount.enabled")
    }
  }
}
