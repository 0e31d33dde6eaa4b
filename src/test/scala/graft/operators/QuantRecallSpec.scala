package graft.operators

import graft.SparkSpec
import graft.tools.QuantRecall

/** Retrieval-quality floors for the QUANTIZED ANN tiers (VERDICT r11
  * #5, the symmetry partner of the IVF recall bounds in AnnIndexSpec):
  * PQ / IVFADC / SQ8 bound recall by QUANTIZATION ERROR, not (only) by
  * partial probing, so each tier needs its own pinned floor. All bounds
  * are on the deterministic clustered corpus (16 well-separated
  * centers — the workload these indexes exist for); the isotropic
  * numbers and the sf0.1-vs-sf1 scale tables live in NOTES.md
  * (graft.tools.QuantRecall).
  *
  * The load-bearing physics these pins encode:
  *  - SQ8 (8 bits per dimension, per-dim min/max scaling) is near-exact:
  *    recall@10 must be ~1 — the tightest floor.
  *  - PQ recall depends on CODE DIVERSITY among true neighbors: with
  *    ksub <= clusters-per-subspace, every vector of a cluster collapses
  *    to the same code, ADC ties the whole cluster, and top-k decays to
  *    the tie-break — so ksub=64 must beat ksub=16 decisively, and the
  *    ksub=16 collapse is itself asserted (it is a real property users
  *    must size ksub around, not a bug).
  *  - IVFADC is bounded above by its own exhaustive-ADC ceiling at every
  *    nProbe (coarse pruning can only LOSE candidates), is monotone in
  *    nProbe, and must EQUAL the ceiling at nProbe = nCells (probing
  *    everything reduces IVFADC to exhaustive ADC exactly).
  */
class QuantRecallSpec extends SparkSpec {
  import spark.implicits._

  private val k = 10

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

  private def recallOf(truth: Map[Long, Set[Long]],
                       got: Map[Long, Set[Long]]): Double =
    truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / truth.size

  test("quantized-tier recall floors: sq8 ~exact; pq needs ksub above " +
      "per-subspace cluster multiplicity; ivfadc <= its ADC ceiling, " +
      "monotone, equal at nProbe = nCells") {
    withTempDir { dir =>
      // exactly the tool's sf0.1 clustered configuration (NOTES table),
      // so the pins are regression nets over MEASURED numbers: sq8 1.0,
      // pq m8k64 0.764, m8k16 tie-collapse 0.082, ivfadc == ceiling
      val corpus = QuantRecall.clusteredCorpus(spark, 2000).cache()
      val queries = corpus.filter($"vec_id" % 40 === 0).limit(50).cache()
      val truth = topSets(Similarity.bruteForceTopK(
        corpus, queries, "vec_id", "embedding", k))

      // ---- SQ8: scalar quantization is near-exact
      val sqIdx = s"$dir/sq8"
      Similarity.writeSq8Index(spark, sqIdx, corpus, "vec_id", "embedding")
      val sq8 = recallOf(truth, topSets(Similarity.sq8TopKIndexed(
        spark, sqIdx, queries, "vec_id", "embedding", k)))
      info(f"sq8 recall@10 = $sq8%.3f")
      assert(sq8 >= 0.95, s"sq8 is near-exact quantization; got $sq8")

      // ---- PQ: one persisted index at (m=8, ksub=16, 16 coarse cells);
      // its exhaustive-ADC recall IS the ksub=16 number (indexed search
      // is spec'd bit-identical to the ad-hoc operator elsewhere)
      val idx = s"$dir/pq"
      Similarity.writePqIndex(spark, idx, corpus, "vec_id", "embedding",
        dim = QuantRecall.Dim, m = 8, ksub = 16, trainIters = 2,
        coarseCells = 16, coarseIters = 2)
      val ceiling16 = recallOf(truth, topSets(Similarity.pqTopKIndexed(
        spark, idx, queries, "vec_id", "embedding", k,
        dim = QuantRecall.Dim, m = 8)))
      val pq64 = recallOf(truth, topSets(Similarity.pqTopK(
        corpus, queries, "vec_id", "embedding", k, dim = QuantRecall.Dim,
        m = 8, ksub = 64, trainIters = 2)))
      info(f"pq m8 recall@10: ksub=16 -> $ceiling16%.3f, ksub=64 -> $pq64%.3f")
      // the collapse: 16 centroids per subspace converge to the 16
      // cluster centers, every same-cluster vector gets the same code,
      // and recall@10 decays toward |k| / cluster-size tie-break noise
      assert(ceiling16 <= 0.2,
        s"ksub=16 on a 16-cluster corpus must tie-collapse: $ceiling16")
      assert(pq64 >= 0.7,
        s"ksub=64 splits clusters into distinguishable codes: $pq64")
      assert(pq64 > ceiling16 + 0.2,
        s"finer codebooks must win decisively: $pq64 vs $ceiling16")

      // ---- refine tier: exact rerank of the ADC shortlist must not
      // lose recall at any factor (the rerank returns the TRUE best k
      // within a superset of the ADC top-k), and it is the designed
      // escape from the tie-collapse above
      val refined4 = recallOf(truth, topSets(Similarity.pqTopKRefinedIndexed(
        spark, idx, corpus, queries, "vec_id", "embedding", k,
        dim = QuantRecall.Dim, m = 8, shortlistFactor = 4)))
      val refined16 = recallOf(truth, topSets(Similarity.pqTopKRefinedIndexed(
        spark, idx, corpus, queries, "vec_id", "embedding", k,
        dim = QuantRecall.Dim, m = 8, shortlistFactor = 16)))
      info(f"refined recall@10: factor 4 -> $refined4%.3f, " +
        f"factor 16 -> $refined16%.3f (adc ceiling $ceiling16%.3f)")
      assert(refined4 >= ceiling16 - 1e-9,
        s"refine must not lose recall: $refined4 < $ceiling16")
      assert(refined16 >= refined4 - 1e-9,
        s"recall must not decrease with the factor: $refined16 < $refined4")

      // ---- IVFADC against the same artifact: bounded by the ceiling,
      // monotone in nProbe, equal to the ceiling when every cell probes
      val probes = Seq(1, 4, 16)
      val curve = probes.map { p =>
        p -> recallOf(truth, topSets(Similarity.ivfPqTopKIndexed(
          spark, idx, queries, "vec_id", "embedding", k,
          dim = QuantRecall.Dim, m = 8, nProbe = p)))
      }
      info(curve.map { case (p, r) => f"ivfadc nProbe=$p -> $r%.3f" }
        .mkString(", "))
      curve.foreach { case (p, r) =>
        assert(r <= ceiling16 + 1e-9,
          s"coarse pruning can only lose candidates: nProbe=$p $r > ceiling")
      }
      curve.sliding(2).foreach { case Seq((pa, ra), (pb, rb)) =>
        assert(rb >= ra - 1e-9,
          s"ivfadc recall must not decrease with nProbe: $pa->$ra vs $pb->$rb")
      }
      assert(math.abs(curve.last._2 - ceiling16) < 1e-9,
        s"nProbe=nCells must equal exhaustive ADC: " +
          s"${curve.last._2} vs $ceiling16")

      // ---- IVFADC + refine (VERDICT r12 #6): the exact rerank lifts
      // the probed tier exactly as it lifts exhaustive ADC — refined
      // recall >= the plain IVFADC number at every (nProbe, factor),
      // and is monotone in the factor within a probe budget
      probes.zip(curve).foreach { case (p, (_, plain)) =>
        val rf4 = recallOf(truth, topSets(Similarity.ivfPqTopKRefinedIndexed(
          spark, idx, corpus, queries, "vec_id", "embedding", k,
          dim = QuantRecall.Dim, m = 8, nProbe = p, shortlistFactor = 4)))
        val rf16 = recallOf(truth, topSets(Similarity.ivfPqTopKRefinedIndexed(
          spark, idx, corpus, queries, "vec_id", "embedding", k,
          dim = QuantRecall.Dim, m = 8, nProbe = p, shortlistFactor = 16)))
        info(f"ivfadc refined nProbe=$p: factor 4 -> $rf4%.3f, " +
          f"factor 16 -> $rf16%.3f (plain $plain%.3f)")
        assert(rf4 >= plain - 1e-9,
          s"refine must not lose recall at nProbe=$p: $rf4 < $plain")
        assert(rf16 >= rf4 - 1e-9,
          s"recall must not decrease with the factor at nProbe=$p: " +
            s"$rf16 < $rf4")
      }
    }
  }
}
