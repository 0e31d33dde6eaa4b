package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 optimization scratch: q_supplier_pagerank plan variants, timed in
  * one JVM under Bench's session config, outputs checked identical to the
  * current (baseline) form. Usage: ProfilePageRank <sfDir> <cpus> [samples]
  */
object ProfilePageRank {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1)
    val samples = if (args.length > 2) args(2).toInt else 3

    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.queries.Tables.t

    def co(): DataFrame =
      t(spark, sfDir, "orders")
        .join(t(spark, sfDir, "lineitem"), $"o_orderkey" === $"l_orderkey")
        .select($"o_custkey".as("c"), ($"l_suppkey" + 1000000000L).as("p"))
        .distinct()

    def finish(edges: DataFrame): DataFrame =
      graft.operators.PageRank.ranks(edges, 3)
        .orderBy($"r".desc, $"id".asc).limit(20)
        .select($"id".as("node_id"), $"r".as("rank_scaled"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "explode2_localckpt_A" -> (() => {
        val c = co().localCheckpoint()
        finish(c.select(explode(array(
            struct($"c".as("src"), $"p".as("dst")),
            struct($"p".as("src"), $"c".as("dst")))).as("e"))
          .select($"e.src".as("src"), $"e.dst".as("dst")))
      }),
      "baseline_union" -> (() => {
        val c = co()
        finish(c.select($"c".as("src"), $"p".as("dst"))
          .union(c.select($"p".as("src"), $"c".as("dst"))))
      }),
      "explode2" -> (() => {
        val c = co()
        finish(c.select(explode(array(
            struct($"c".as("src"), $"p".as("dst")),
            struct($"p".as("src"), $"c".as("dst")))).as("e"))
          .select($"e.src".as("src"), $"e.dst".as("dst")))
      }),
      "explode2_localckpt" -> (() => {
        val c = co().localCheckpoint()
        finish(c.select(explode(array(
            struct($"c".as("src"), $"p".as("dst")),
            struct($"p".as("src"), $"c".as("dst")))).as("e"))
          .select($"e.src".as("src"), $"e.dst".as("dst")))
      }),
      "union_localckpt" -> (() => {
        val c = co().localCheckpoint()
        finish(c.select($"c".as("src"), $"p".as("dst"))
          .union(c.select($"p".as("src"), $"c".as("dst"))))
      }),
      "explode2_persist_edges" -> (() => {
        val c = co()
        val edges = c.select(explode(array(
            struct($"c".as("src"), $"p".as("dst")),
            struct($"p".as("src"), $"c".as("dst")))).as("e"))
          .select($"e.src".as("src"), $"e.dst".as("dst"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        finish(edges)
      })
    )

    // warm
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }

    var ref: Array[String] = null
    variants.foreach { case (name, mk) =>
      val times = (1 to samples).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        mk().count()
        (System.nanoTime() - t0) / 1e9
      }
      // result equality vs baseline (sorted string rows)
      val rows = mk().collect().map(_.toString).sorted
      if (ref == null) ref = rows
      val same = java.util.Arrays.equals(
        rows.asInstanceOf[Array[AnyRef]], ref.asInstanceOf[Array[AnyRef]])
      spark.catalog.clearCache()
      println(f"VARIANT $name%-24s min=${times.min}%.3f all=${times.map(x => f"$x%.3f").mkString(",")} identical=$same")
    }
    spark.stop()
  }
}
