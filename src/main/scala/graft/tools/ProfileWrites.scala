package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.delta.DeltaTable

/** Throwaway stage-level profiler for the two bench regressions
  * (delta_sql_time_travel, delta_generated_partition): prints the wall
  * time of each write/read stage separately so the regression can be
  * attributed to a stage instead of a whole query. */
object ProfileWrites {
  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROFILE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }

    // --- delta_sql_time_travel decomposition
    val path = java.nio.file.Files.createTempDirectory("graft_prof_tt").toString
    val orders = graft.queries.Tables.t(spark, sfDir, "orders")
    time("tt_write1_overwrite") {
      DeltaTable.write(orders.filter($"o_orderstatus" === "F"), path, SaveMode.Overwrite)
    }
    time("tt_write2_append") {
      DeltaTable.write(orders.filter($"o_orderstatus" === "O"), path)
    }
    time("tt_write3_append") {
      DeltaTable.write(orders.filter($"o_orderstatus" === "P"), path)
    }
    time("tt_sql_read") {
      spark.sql(s"""
        SELECT t.o_orderstatus, COUNT(*) AS n, MAX(h.n_commits) AS n_commits
        FROM graft_table('$path', 1) t
        CROSS JOIN (SELECT COUNT(*) AS n_commits
                    FROM graft_history('$path')) h
        GROUP BY t.o_orderstatus""").count()
    }

    // --- delta_generated_partition decomposition
    val gp = java.nio.file.Files.createTempDirectory("graft_prof_gp").toString
    val ev = graft.queries.Tables.t(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    time("gp_create") {
      DeltaTable.create(spark, gp,
        org.apache.spark.sql.types.StructType(ev.schema.fields :+
          org.apache.spark.sql.types.StructField("day",
            org.apache.spark.sql.types.StringType)),
        partitionBy = Seq("day"),
        generatedColumns = Map("day" -> "date_format(ts, 'yyyy-MM-dd')"))
    }
    time("gp_write") { DeltaTable.write(ev, gp) }
    time("gp_read") {
      DeltaTable.forPath(spark, gp).toDF
        .filter($"day" >= "2024-01-10" && $"day" <= "2024-01-12")
        .groupBy($"day", $"event_type")
        .agg(count(lit(1)).as("n")).count()
    }
    time("gp_write_warm2") { DeltaTable.write(ev, gp) }
    time("gp_write_warm3") { DeltaTable.write(ev, gp) }

    // same write with per-file stats collection disabled: the difference
    // is the stats read-back job's share of a warm append
    val ns = java.nio.file.Files.createTempDirectory("graft_prof_ns").toString
    DeltaTable.write(ev.withColumn("day", date_format($"ts", "yyyy-MM-dd")),
      ns, SaveMode.Overwrite, partitionBy = Seq("day"),
      configuration = Map("delta.dataSkippingNumIndexedCols" -> "0"))
    time("nostats_part_write_warm") {
      DeltaTable.write(ev.withColumn("day", date_format($"ts", "yyyy-MM-dd")), ns)
    }
    time("nostats_part_write_warm2") {
      DeltaTable.write(ev.withColumn("day", date_format($"ts", "yyyy-MM-dd")), ns)
    }

    // unpartitioned warm append baseline for comparison
    val up = java.nio.file.Files.createTempDirectory("graft_prof_up").toString
    DeltaTable.write(ev, up, SaveMode.Overwrite)
    time("unpart_write_warm") { DeltaTable.write(ev, up) }
    spark.stop()
  }
}
