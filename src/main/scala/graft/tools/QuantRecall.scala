package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Retrieval-quality evidence for the QUANTIZED ANN tiers (VERDICT r11
  * #5, the symmetry partner of [[RecallCurve]]'s IVF curves): PQ, IVFADC
  * and SQ8 bound recall by QUANTIZATION ERROR, not (only) by partial
  * probing, so each needs its own measured floor —
  *
  *  - PQ (exhaustive ADC): recall@k vs brute force across (m, ksub) —
  *    finer subspaces / more centroids per subspace must help;
  *  - IVFADC: the nProbe x ADC interaction — recall at each nProbe
  *    against BOTH the exact ground truth and the exhaustive-ADC
  *    ceiling (at nProbe = nCells the two must coincide: coarse pruning
  *    admits everything, quantization error is all that remains);
  *  - SQ8: one number — 8-bit per-dimension scalar quantization is
  *    near-exact, so its recall floor is the tightest.
  *
  * Two corpora, same regimes as the IVF curves: a CLUSTERED synthetic
  * corpus (16 well-separated centers — the workload these indexes exist
  * for) and the driver's ISOTROPIC embeddings (adversarial: all cosines
  * ~0, so quantization noise competes with signal).
  *
  * Usage: runMain graft.tools.QuantRecall <sfDir> [k] [nQueries]
  * Prints one JSON line per corpus. The spec twin (AnnIndexSpec) pins
  * the floors in-suite; the sf0.1-vs-sf1 tables live in NOTES.md.
  */
object QuantRecall {
  val Dim = 64

  /** Deterministic clustered corpus: 16 centers at +/-4 on sign
    * patterns of the cluster id, small per-vector perturbation — same
    * recipe as AnnIndexSpec's IVF recall corpus, widened to dim 64. */
  def clusteredCorpus(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map { i =>
      val cl = (i % 16).toInt
      val v = Array.tabulate(Dim) { d =>
        val center = if (((cl >> (d % 4)) & 1) == 0) 4.0 else -4.0
        center + ((i * 31 + d * 7) % 11 - 5) * 0.1
      }
      (i, v)
    }.toDF("vec_id", "embedding")
  }

  private def topSets(spark: SparkSession,
                      df: DataFrame): Map[Long, Set[Long]] = {
    import spark.implicits._
    df.select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
  }

  private def recallOf(truth: Map[Long, Set[Long]],
                       got: Map[Long, Set[Long]]): Double =
    truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / truth.size

  private def fmt(r: Double): String =
    BigDecimal(r).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString

  /** Full sweep over one corpus; returns the JSON fragment. */
  def sweep(spark: SparkSession, label: String, corpus: DataFrame,
            queries: DataFrame, k: Int, workDir: String): String = {
    val truth = topSets(spark, Similarity.bruteForceTopK(
      corpus, queries, "vec_id", "embedding", k))

    // PQ exhaustive ADC across (m, ksub)
    val pqCells = Seq((4, 16), (8, 16), (8, 64)).map { case (m, ksub) =>
      val r = recallOf(truth, topSets(spark, Similarity.pqTopK(
        corpus, queries, "vec_id", "embedding", k, dim = Dim,
        m = m, ksub = ksub, trainIters = 2)))
      s""""m${m}_k$ksub":${fmt(r)}"""
    }.mkString(",")

    // IVFADC: one persisted index (m=8, ksub=16, 16 coarse cells),
    // nProbe swept; exhaustive ADC on the same artifact is the ceiling
    val idx = s"$workDir/quant_recall_${label}_pq"
    Similarity.writePqIndex(spark, idx, corpus, "vec_id", "embedding",
      dim = Dim, m = 8, ksub = 16, trainIters = 2,
      coarseCells = 16, coarseIters = 2)
    val adcCeiling = recallOf(truth, topSets(spark,
      Similarity.pqTopKIndexed(spark, idx, queries,
        "vec_id", "embedding", k, dim = Dim, m = 8)))
    val ivfadcCells = Seq(1, 2, 4, 8, 16).map { p =>
      val r = recallOf(truth, topSets(spark,
        Similarity.ivfPqTopKIndexed(spark, idx, queries,
          "vec_id", "embedding", k, dim = Dim, m = 8, nProbe = p)))
      s""""$p":${fmt(r)}"""
    }.mkString(",")

    // SQ8
    val sqIdx = s"$workDir/quant_recall_${label}_sq8"
    Similarity.writeSq8Index(spark, sqIdx, corpus, "vec_id", "embedding")
    val sq8 = recallOf(truth, topSets(spark,
      Similarity.sq8TopKIndexed(spark, sqIdx, queries,
        "vec_id", "embedding", k)))

    s""""$label":{"n":${corpus.count()},"pq":{$pqCells},""" +
      s""""adc_ceiling":${fmt(adcCeiling)},"ivfadc":{$ivfadcCells},""" +
      s""""sq8":${fmt(sq8)}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val nQueries = args.lift(2).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val workDir = java.nio.file.Files
      .createTempDirectory("quant_recall").toString

    val iso = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val nIso = iso.count()
    val clustered = clusteredCorpus(spark, nIso)

    def querySet(corpus: DataFrame, n: Long): DataFrame = {
      val stride = math.max(1L, n / nQueries)
      corpus.filter($"vec_id" % stride === 0).limit(nQueries).cache()
    }

    val parts = Seq(
      sweep(spark, "clustered", clustered, querySet(clustered, nIso), k,
        workDir),
      sweep(spark, "isotropic", iso, querySet(iso, nIso), k, workDir))
    println(s"""{"k":$k,"nQueries":$nQueries,${parts.mkString(",")}}""")
    spark.stop()
  }
}
