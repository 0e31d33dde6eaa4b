package graft.tools

import org.apache.spark.sql.SparkSession

/** r15 evidence tool: dump the `.explain("formatted")` of the
  * frozen-quantizer ENCODE frame (the intermediate plan inside
  * ann_incremental_topk's timed region, not visible in the returned
  * probe frame). Usage: DumpEncodePlan <sfDir> <outFile>
  */
object DumpEncodePlan {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outFile) = args
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    val emb = graft.queries.Tables.t(spark, sfDir, "embeddings")
    val idx = graft.queries.IndexCache.pqIndexEven(spark, sfDir)
    val enc = graft.operators.Similarity.encodePqBatch(spark, idx,
      emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding",
      dim = 64, m = 4)
    val plan = enc.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      plan.getBytes("UTF-8"))
    println(s"wrote $outFile")
    spark.stop()
  }
}
