package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SemDeDup cluster-size cap (`spark.graft.dedup.maxClusterSize`):
  * candidate volume in [[Dedup.semanticPairs]] is Σ cell_size², so one
  * degenerate giant cluster — the boilerplate-heavy-corpus shape — makes
  * the within-cell self-join quadratic in it. Oversized cells must
  * recursively re-cluster until bounded, WITHOUT changing which
  * qualifying pairs come out (exact-duplicate vectors share every
  * affinity, so any k-means split keeps them together), and a cell of
  * identical vectors — unsplittable by construction, and inherently
  * quadratic in its OUTPUT — must freeze rather than loop. */
class SemanticCapSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 40

  /** One dominant direction (2·e0) carrying `groups` exact-duplicate
    * families of `copies` members each (family g: 2·e0 + e_{1+g} — exact
    * copies within a family, cosine 4/5 = 0.8 < 0.9 across families),
    * plus `far` singleton vectors on dims the dominant direction never
    * touches (cosine 0 to everything else). The lowest ids are one
    * dominant member and the far singletons, so lowest-id seeding pins
    * one centroid on the dominant direction and every dominant member
    * lands in ONE top-level cell. */
  private def skewedCorpus(groups: Int, copies: Int, far: Int) = {
    require(1 + groups + far <= dim, "needs a free dim per group/singleton")
    def unit(d: Int) = Array.tabulate(dim)(i => if (i == d) 1.0 else 0.0)
    def dominant(g: Int) =
      Array.tabulate(dim)(i =>
        if (i == 0) 2.0 else if (i == 1 + g) 1.0 else 0.0)
    // ids 0..far: seeds (one dominant member + the far singletons)
    val seedRows = (0L, dominant(0)) +:
      (0 until far).map(s => (1L + s, unit(1 + groups + s)))
    val dominantRows = for {
      g <- 0 until groups; c <- 0 until copies
      if !(g == 0 && c == 0) // id 0 already is family 0's first copy
    } yield (100L + g * copies + c, dominant(g))
    (seedRows ++ dominantRows).toDF("vec_id", "embedding")
  }

  private def withCap[T](cap: Long)(f: => T): T = {
    val key = "spark.graft.dedup.maxClusterSize"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, cap.toString)
    try f
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("i").cast("long"), col("j").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("capped run bounds every cell and returns the uncapped pairs") {
    // 10 families × 12 copies = 120 dominant vectors in one top-level
    // cell; cap 32 forces recursive splits
    val corpus = skewedCorpus(groups = 10, copies = 12, far = 7)
    val uncapped = withCap(0L) {
      pairSet(Dedup.semanticPairs(corpus, "vec_id", "embedding",
        nCells = 8, trainIters = 1, threshold = 0.9))
    }
    assert(uncapped.size === 10 * (12 * 11) / 2,
      "uncapped baseline: every within-family pair and nothing else")
    val (capped, maxCell) = withCap(32L) {
      val c = Similarity.corpusFace(corpus, "vec_id", "embedding")
      val assign = Dedup.semanticAssignments(corpus, c, "vec_id", "embedding",
        nCells = 8, trainIters = 1)
      val sizes = assign.groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).collect()(0).getLong(0)
      val pairs = pairSet(Dedup.semanticPairs(corpus, "vec_id", "embedding",
        nCells = 8, trainIters = 1, threshold = 0.9))
      (pairs, sizes)
    }
    assert(Dedup.lastSemanticSplitDepth >= 1, "the cap must have split")
    assert(maxCell <= 32L, s"every cell within the cap, saw $maxCell")
    assert(capped === uncapped,
      "exact-duplicate families survive every split together")
  }

  test("identical-vector cell freezes instead of looping and keeps all pairs") {
    val one = Array.tabulate(dim)(i => if (i == 0) 3.0 else 1.0)
    val rows = (0L until 50L).map(i => (i, one)) :+
      (99L, Array.tabulate(dim)(i => if (i == dim - 1) 5.0 else 0.0))
    val corpus = rows.toDF("vec_id", "embedding")
    val pairs = withCap(16L) {
      pairSet(Dedup.semanticPairs(corpus, "vec_id", "embedding",
        nCells = 4, trainIters = 1, threshold = 0.9))
    }
    // the 50-identical cell cannot shrink below the cap: every pair is a
    // true duplicate, the output itself is quadratic — assert the full
    // pair set arrives and the splitter terminated early (freeze), not
    // at the depth bound
    assert(pairs.size === 50 * 49 / 2)
    assert(Dedup.lastSemanticSplitDepth < 6,
      "identical cell must freeze, not grind to the depth bound")
  }

  test("default cap leaves small corpora untouched") {
    val corpus = skewedCorpus(groups = 4, copies = 3, far = 3)
    val base = withCap(0L) {
      pairSet(Dedup.semanticPairs(corpus, "vec_id", "embedding",
        nCells = 4, trainIters = 2, threshold = 0.9))
    }
    val dflt = pairSet(Dedup.semanticPairs(corpus, "vec_id", "embedding",
      nCells = 4, trainIters = 2, threshold = 0.9))
    assert(Dedup.lastSemanticSplitDepth === 0)
    assert(dflt === base)
  }
}
