package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different text about spark engines and logs"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "tiny")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical keys") {
    val groups = Dedup.exact(docs, "doc_id", col("text")).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("group_size") == 2)
    assert(groups.head.getAs[Long]("representative") == 1L)
  }

  test("cross-doc n-gram dup fraction: shared spans count, short docs zero") {
    // doc 1 and 4 are identical (9 words -> 7 trigram... n=5 -> 5 grams,
    // all shared); doc 2 shares its first 5 positions' grams with 1/4
    // only where all five words match; doc 5 is under n words
    val out = Dedup.crossDocNgramDupFraction(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(out(5L) == (0L, 0.0))             // 1 word < n: zero positions
    assert(out(1L)._1 == 5L && out(1L)._2 == 1.0) // every gram also in doc 4
    assert(out(4L)._2 == 1.0)
    // doc 2 differs in the last word: grams touching "cat" are unique,
    // grams fully inside the shared prefix ("the quick brown fox jumps",
    // ...) are duplicated in docs 1 and 4
    assert(out(2L)._1 == 5L && out(2L)._2 == 0.8)
    assert(out(3L)._2 == 0.0)                // nothing shared
  }

  test("minhash LSH finds the near-duplicate pair") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleWidth = 3, k = 12, bands = 6, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup always collides
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
      s"near-dup pair not found in $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("incremental minhash dedup equals the batch-restricted full dedup") {
    val batch = docs.filter($"doc_id".isin(1L, 5L))
    val inc = Dedup.incrementalMinhashLsh(docs, batch, "doc_id", "text",
        shingleWidth = 3, k = 12, bands = 6, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // directional, batch-endpoint pairs of the full dedup, same-id excluded
    val full = Dedup.minhashLsh(docs, "doc_id", "text",
        shingleWidth = 3, k = 12, bands = 6, threshold = 0.5)
      .collect().flatMap(r =>
        Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0)))).toSet
    val expected = full.filter(p => Set(1L, 5L).contains(p._1))
    assert(inc == expected, s"inc=$inc expected=$expected")
    assert(inc.contains((1L, 4L))) // batch doc 1 duplicates corpus doc 4
    assert(!inc.exists(_._1 == 5L)) // "tiny" has no shingles, no matches
  }

  test("simhash of identical docs is identical; near-dups are close") {
    val hs = docs.select($"doc_id",
      graft.functions.simhash($"text", 60).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(4L))
    val nearDist = java.lang.Long.bitCount(hs(1L) ^ hs(2L))
    val farDist = java.lang.Long.bitCount(hs(1L) ^ hs(3L))
    assert(nearDist < farDist, s"near=$nearDist far=$farDist")
  }

  test("ngram jaccard pairs exceed threshold only for near-dups") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text",
      n = 3, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 1.0))
    assert(pairs.forall(p => Set(1L, 2L, 4L).contains(p._1)))
  }

  test("PQ top-k ranks an exact duplicate first and never moves raw vectors") {
    import spark.implicits._
    // 8+ vectors so every subspace has seeds; 101 duplicates 1 exactly
    val vecs = ((1 to 12).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 7 + d * 3) % 10) / 10.0f))
    } :+ (101L, Array.tabulate(8)(d => ((1 * 7 + d * 3) % 10) / 10.0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.pqTopK(vecs, vecs.filter($"vec_id" === 101L),
      "vec_id", "embedding", k = 3, dim = 8, m = 2, ksub = 4, trainIters = 1)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    // the exact duplicate codes to the same centroids in every subspace,
    // so its reconstructed score is the maximum possible — rank 1
    assert(top.head._2 == 1L, s"duplicate must rank first: ${top.toSeq}")
    assert(top.head._1 == 1 && top.head._3 > 0.99, top.toSeq.toString)
  }

  test("brute-force top-k ranks the exact duplicate first") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1),
      "vec_id", "embedding", k = 2).collect()
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(4L, 2L))
    assert(top.head.getAs[Double]("cosine") == 1.0)
  }

  test("LSH top-k returns neighbors from the query's bucket only") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 7 + d * 13) % 17 - 8).toFloat))
    }.toDF("vec_id", "embedding")
    val res = Similarity.lshTopK(vecs, vecs.filter($"vec_id" < 3),
      "vec_id", "embedding", dim = 8, k = 3, planes = 2)
    val byQuery = res.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.nonEmpty)
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).toSeq.sorted == (1 to rows.length))
    }
  }

  test("multi-probe LSH reaches neighbors across one hyperplane boundary") {
    val vecs = (0 until 80).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 13 + d * 5) % 21 - 10).toFloat))
    }.toDF("vec_id", "embedding")
    def run(mp: Boolean) = Similarity.lshTopK(vecs, vecs.filter($"vec_id" < 5),
      "vec_id", "embedding", dim = 8, k = 5, planes = 3, multiProbe = mp)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val single = run(false)
    val multi = run(true)
    // more probes can only widen the candidate pool
    assert(multi.size >= single.size,
      s"multi-probe returned fewer results: single=$single multi=$multi")
    val res = Similarity.lshTopK(vecs, vecs.filter($"vec_id" < 5),
      "vec_id", "embedding", dim = 8, k = 5, planes = 3, multiProbe = true)
    res.collect().groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).toSeq.sorted == (1 to rows.length))
      // a neighbor never appears twice for one query (one bucket per row)
      assert(rows.map(_.getAs[Long]("neighbor_id")).distinct.length == rows.length)
    }
  }

  test("IVF top-k probes nearest cells and ranks within them") {
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 11 + d * 7) % 19 - 9).toFloat))
    }.toDF("vec_id", "embedding")
    val res = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" < 4),
      "vec_id", "embedding", k = 3, nCells = 8, nProbe = 8)
    val byQuery = res.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L))
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).toSeq.sorted == (1 to rows.length))
      // never returns the query itself
      assert(!rows.exists(r => r.getAs[Long]("neighbor_id") ==
        r.getAs[Long]("query_id")))
    }
    // probing EVERY cell makes IVF exact: it must agree with brute force
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" < 4),
      "vec_id", "embedding", k = 3)
    assert(res.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet ==
      brute.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
  }

  test("k-means-trained IVF recall is at least first-ids recall at equal nProbe") {
    // clustered corpus: 6 latent centers, first-ids centroids all land in
    // the low-id region so untrained cells are badly unbalanced — exactly
    // the case Lloyd refinement exists for
    val vecs = (0 until 120).map { i =>
      val center = i % 6
      (i.toLong, Array.tabulate(8)(d =>
        (center * 13 + (if (d == center) 40 else 0) +
          ((i * 7 + d * 3) % 5) - 2).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 6)
    val truth = Similarity.bruteForceTopK(vecs, queries,
      "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet

    def recall(trainIters: Int): Double = {
      val got = Similarity.ivfTopK(vecs, queries, "vec_id", "embedding",
        k = 5, nCells = 6, nProbe = 1, trainIters = trainIters)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val untrained = recall(0)
    val trained = recall(2)
    assert(trained >= untrained,
      s"k-means recall $trained < first-ids recall $untrained")
    // training is deterministic: same input → same centroids → same answer
    val again = Similarity.ivfTopK(vecs, queries, "vec_id", "embedding",
      k = 5, nCells = 6, nProbe = 1, trainIters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val first = Similarity.ivfTopK(vecs, queries, "vec_id", "embedding",
      k = 5, nCells = 6, nProbe = 1, trainIters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(again.sorted == first.sorted)
  }

  test("multimodal: byte-sum expression and feature extraction stub") {
    val media = Multimodal.mediaFromText(docs, "doc_id", "text")
    assert(media.schema("media").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val sums = media.select($"id", Multimodal.byteSum($"media").as("bs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sums(5L) == "tiny".getBytes("UTF-8").map(_ & 0xff).sum.toLong)
    val feats = Multimodal.extractFeatures(media)
    val row5 = feats.filter($"id" === 5L).head()
    assert(row5.getSeq[Float](row5.fieldIndex("features")).length == 4)
    assert(row5.getAs[Long]("n_bytes") == 4L)
  }

  test("multimodal resize and frame sampling follow the stub contracts") {
    import spark.implicits._
    val docs = Seq((1L, "a" * 100), (2L, "b" * 10), (3L, "c" * 70))
      .toDF("doc_id", "text")
    val media = graft.multimodal.Multimodal.mediaFromText(docs, "doc_id", "text")
    val resized = graft.multimodal.Multimodal.resize(media, 64, 64) // budget 16
    val sizes = resized.select($"id", $"n_bytes").as[(Long, Long)].collect().toMap
    assert(sizes == Map(1L -> 16L, 2L -> 10L, 3L -> 16L))

    val frames = graft.multimodal.Multimodal
      .sampleFrames(media, frameBytes = 32, everyN = 2)
    val perDoc = frames.groupBy($"id").count().as[(Long, Long)].collect().toMap
    // 100/32=3 frames -> idx 0,2 = 2 kept; 10/32=0; 70/32=2 -> idx 0 = 1
    assert(perDoc == Map(1L -> 2L, 3L -> 1L))
    val f0 = frames.filter($"id" === 1L && $"frame_idx" === 0)
      .select($"frame").as[Array[Byte]].head()
    assert(f0.length == 32 && f0.forall(_ == 'a'.toByte))
  }

  test("connected components labels every node with its cluster minimum") {
    // chain 1-2-3-4 (diameter 3: needs >1 propagation round), pair 7-8,
    // isolated-by-absence 9 (no edges -> not in the output)
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (7L, 8L))
      .toDF("i", "j")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L))
  }

  test("distributed label propagation agrees with the driver union-find") {
    // the same graph through both paths: a chain (multi-round), a
    // triangle, a star, and a 2-clique
    val pairs = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)) ++
      Seq((10L, 11L), (11L, 12L), (12L, 10L)) ++
      (21L to 24L).map(i => (20L, i)) ++
      Seq((30L, 31L))).toDF("i", "j")
    def run(): Map[Long, Long] = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDriver = run()
    spark.conf.set("spark.graft.cc.driverMaxEdges", "0")
    try {
      val viaDistributed = run()
      assert(viaDriver == viaDistributed)
      assert(viaDriver(5L) == 1L && viaDriver(12L) == 10L &&
        viaDriver(24L) == 20L && viaDriver(31L) == 30L)
    } finally spark.conf.unset("spark.graft.cc.driverMaxEdges")
  }

  test("connected components converges on a long path and a cycle") {
    val path = (1L until 12L).map(i => (i, i + 1)).toDF("i", "j")
    val gotPath = Dedup.connectedComponents(path).collect()
      .map(r => r.getLong(1)).distinct
    assert(gotPath.sameElements(Array(1L)))
    val cycle = (Seq((20L, 21L), (21L, 22L), (22L, 20L))).toDF("i", "j")
    val gotCycle = Dedup.connectedComponents(cycle).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotCycle == Map(20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("pointer jumping: a 200-link chain converges inside the default " +
      "round budget on the DISTRIBUTED path") {
    // diameter 200 >> maxRounds=50: pure min-label propagation would
    // abort; the per-round pointer jump makes convergence O(log d)
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("i", "j")
    spark.conf.set("spark.graft.cc.driverMaxEdges", "0")
    try {
      val got = Dedup.connectedComponents(chain).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == 201)
      assert(got.values.forall(_ == 0L),
        s"every node labels with the chain minimum: " +
          s"${got.filter(_._2 != 0L).take(5)}")
    } finally spark.conf.unset("spark.graft.cc.driverMaxEdges")
  }

  test("salted join equals the plain join on a pathologically skewed key") {
    // 90% of facts on one hot key
    val facts = spark.range(0, 2000).toDF("id")
      .withColumn("k", when($"id" % 10 =!= 0, 7L).otherwise($"id" % 5))
      .withColumn("v", $"id" * 3)
    val dim = spark.range(0, 10).toDF("k").withColumn("label", concat(lit("d"), $"k"))
    val plain = facts.join(dim, "k")
      .groupBy($"label").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(facts, dim, "k", salts = 8, scatterBy = $"id")
      .groupBy($"label").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
    // the salted plan's fact side actually carries 8 distinct salt values
    // for the hot key (the scatter happened; it isn't a degenerate 1-salt)
    val spread = facts.withColumn("__salt",
        pmod(graft.functions.md5Hash32($"id".cast("string")), lit(8L)))
      .filter($"k" === 7L).select($"__salt").distinct().count()
    assert(spread == 8L, s"hot key scattered over only $spread salts")
  }

  test("saltedJoin keeps fact rows whose scatterBy value is null") {
    // md5Hash32(null) is null; an unguarded salt would silently drop
    // these rows from the inner equi-join even though the KEY matches
    val facts = Seq((1L, Some("a")), (1L, None), (2L, None))
      .toDF("k", "sid")
    val dim = Seq((1L, "one"), (2L, "two")).toDF("k", "label")
    val plain = facts.join(dim, "k")
      .select($"k", $"sid", $"label")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2)))
      .toSet
    val salted = Skew.saltedJoin(facts, dim, "k", salts = 4, scatterBy = $"sid")
      .select($"k", $"sid", $"label")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2)))
      .toSet
    assert(salted == plain, s"salted=$salted plain=$plain")
    assert(salted.size == 3)
  }

  test("rolling fingerprint matches a reference implementation") {
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    val got = docs.select($"doc_id",
      graft.functions.rollingFingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) == ref("tiny"))
    assert(got(1L) == ref("the quick brown fox jumps over the lazy dog"))
  }
}
