package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Retrieval-quality evidence for the IVF tier (VERDICT r10 #8): the ANN
  * oracles prove the deterministic pipeline is computed exactly, not
  * that the index RETRIEVES well — that needs recall@k against the
  * brute-force ground truth, swept over the nProbe dial.
  *
  * Usage: runMain graft.tools.RecallCurve <sfDir> [k] [nCells] [nQueries]
  * Prints one JSON line: {"n":corpus,"k":k,"nCells":c,
  * "recall":{"1":r1,"2":r2,...}} with recall@k averaged over the query
  * set at each nProbe in 1,2,4,8,nCells.
  */
object RecallCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val nCells = args.lift(2).map(_.toInt).getOrElse(16)
    val nQueries = args.lift(3).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val n = corpus.count()
    // query set: a deterministic id-spread sample (every corpus/nQueries-th)
    val stride = math.max(1L, n / nQueries)
    val queries = corpus.filter($"vec_id" % stride === 0)
      .limit(nQueries).cache()
    queries.count()

    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select($"query_id", $"neighbor_id").as[(Long, Long)]
        .collect().groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

    val truth = topSets(
      Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k))
    val probes = (Seq(1, 2, 4, 8) :+ nCells).distinct.filter(_ <= nCells)
    def sweep(trainIters: Int): String = probes.map { p =>
      val got = topSets(Similarity.ivfTopK(corpus, queries,
        "vec_id", "embedding", k, nCells = nCells, nProbe = p,
        trainIters = trainIters))
      val r = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
      s""""$p":${BigDecimal(r).setScale(4, BigDecimal.RoundingMode.HALF_UP)}"""
    }.mkString(",")
    println(s"""{"n":$n,"k":$k,"nCells":$nCells,"nQueries":${truth.size},"recall_untrained":{${sweep(0)}},"recall_kmeans5":{${sweep(5)}}}""")
    spark.stop()
  }
}
