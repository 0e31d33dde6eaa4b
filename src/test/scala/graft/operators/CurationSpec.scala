package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 400L)
    .map(i => (i, s"doc $i body " + ("w " * (i % 7).toInt).trim, s"src${i % 4}"))
    .toDF("doc_id", "text", "source")

  test("groupSplit keeps near-dup clusters whole; decisions equal " +
      "hashSplit on the cluster label") {
    val d = Seq((1L, "a"), (2L, "a"), (3L, "b"),
      (10L, "c"), (20L, "c"), (30L, "c")).toDF("id", "txt")
    // a transitive chain (10-20, 20-30): the whole component must agree
    val pairs = Seq((1L, 2L), (10L, 20L), (20L, 30L)).toDF("i", "j")
    val w = Seq("train" -> 50, "test" -> 50)
    val m = Curation.groupSplit(d, "id", pairs, w)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(m.size == 6, "full schema + every row preserved")
    assert(m(1L) == m(2L), "pair must not straddle the split")
    assert(Set(m(10L), m(20L), m(30L)).size == 1,
      "transitive cluster must land whole")
    // the decision IS hashSplit's decision on the cluster label (min id)
    val h = Curation.hashSplit(
        Seq((1L, 0), (3L, 0), (10L, 0)).toDF("id", "x"), "id", w)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(m(1L) == h(1L) && m(2L) == h(1L))
    assert(m(3L) == h(3L), "singletons keep the per-id decision")
    assert(m(10L) == h(10L) && m(30L) == h(10L))
  }

  test("hashSplit covers every row, is deterministic, and honors weights") {
    val split = Curation.hashSplit(docs, "doc_id",
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 400)
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // same assignment on re-run (pure function of the id)
    val again = Curation.hashSplit(docs, "doc_id",
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
    assert(split.select("doc_id", "split").except(
      again.select("doc_id", "split")).isEmpty)
  }

  test("hashSample is a deterministic subset; salts draw different samples") {
    val s1 = Curation.hashSample(docs, "doc_id", 0.3, "a")
      .select("doc_id").as[Long].collect().toSet
    val s1b = Curation.hashSample(docs, "doc_id", 0.3, "a")
      .select("doc_id").as[Long].collect().toSet
    val s2 = Curation.hashSample(docs, "doc_id", 0.3, "b")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s1b)
    assert(s1 != s2)
    assert(s1.size > 400 * 0.15 && s1.size < 400 * 0.45) // loose hash bound
    // monotone: a smaller rate with the same salt is a subset
    val smaller = Curation.hashSample(docs, "doc_id", 0.1, "a")
      .select("doc_id").as[Long].collect().toSet
    assert(smaller.subsetOf(s1))
  }

  test("packSequences lays buckets end-to-end with straddling spans") {
    val packed = Curation.packSequences(
      docs, "doc_id", lit(100L), ctxLen = 250, buckets = 2)
    val rows = packed.orderBy("bucket", "doc_id")
      .select("doc_id", "bucket", "first_chunk", "last_chunk")
      .collect()
    // within each bucket, chunks advance by 100 tokens per doc over a
    // 250-token context: offsets 0,100,200,300,... -> first chunk
    // floor(off/250), last floor((off+99)/250)
    rows.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      rs.sortBy(_.getLong(0)).zipWithIndex.foreach { case (r, i) =>
        val off = i * 100L
        assert(r.getLong(2) == off / 250, s"first_chunk at offset $off")
        assert(r.getLong(3) == (off + 99) / 250, s"last_chunk at offset $off")
      }
    }
    // the window is per BUCKET — the plan must not contain a
    // partition-less (single-task) window
    val planStr = packed.queryExecution.executedPlan.toString
    assert(!planStr.contains("Window [") ||
      planStr.contains("partitionBy") || !planStr.contains("No Partition"),
      "window must be partitioned by bucket")
  }

  test("scrub replaces every match and counts hits") {
    val scrubbed = Curation.scrub(
      Seq((1L, "call me maybe, call often"), (2L, "no matches here"))
        .toDF("id", "text"),
      "text", raw"\bcall\b", "[X]", "clean")
    val byId = scrubbed.collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("clean"), r.getAs[Int]("clean_hits"))).toMap
    assert(byId(1L) == (("[X] me maybe, [X] often", 2)))
    assert(byId(2L) == (("no matches here", 0)))
  }

  test("stratifiedSample returns exactly n deterministic rows per stratum") {
    val sampled = Curation.stratifiedSample(docs, "source", "doc_id",
      n = 7, salt = "x")
    val counts = sampled.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.toSet == Set(7L))
    assert(counts.keySet == Set("src0", "src1", "src2", "src3"))
    // deterministic across runs
    val again = Curation.stratifiedSample(docs, "source", "doc_id",
      n = 7, salt = "x").select("doc_id").as[Long].collect().toSet
    assert(sampled.select("doc_id").as[Long].collect().toSet == again)
    // a stratum smaller than n returns all of it
    val tiny = Curation.stratifiedSample(docs.limit(3), "source", "doc_id",
      n = 7, salt = "x")
    assert(tiny.count() == 3)
  }

  test("decontaminate flags exactly the docs sharing a benchmark n-gram") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // contains bench gram
      (2L, "one two three four five six seven"),     // clean
      (3L, "x y alpha beta gamma delta epsilon tail"), // contains it mid-doc
      (4L, "too short")                              // < n tokens: clean
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "PRE alpha beta gamma delta epsilon POST"))
      .toDF("bid", "btext")
    val got = Curation.decontaminate(corpus, "doc_id", "text",
      bench, "btext", n = 5)
      .select("doc_id", "contaminated").as[(Long, Boolean)]
      .collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
    // schema: original columns + the flag, row count unchanged
    assert(got.size == 4)
  }

  test("temperatureMix: min domain keeps all; null domain is a real domain") {
    import spark.implicits._
    // en 60, fr 20, null 10 docs: null is the SMALLEST domain — it must
    // keep everything (rate 1), not vanish through an equi-join, and its
    // count legitimately sets n_min for the others
    val rows = (1 to 60).map(i => (i.toLong, Some("en"))) ++
      (61 to 80).map(i => (i.toLong, Some("fr"))) ++
      (81 to 90).map(i => (i.toLong, Option.empty[String]))
    val df = rows.toDF("doc_id", "lang")
    val mixed = Curation.temperatureMix(df, "doc_id", "lang",
      temperature = 2.0, salt = "t")
    val counts = mixed.groupBy("lang").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(counts(None) == 10, s"null domain must keep everything: $counts")
    // en rate = sqrt(10/60) ≈ 0.41, fr rate = sqrt(10/20) ≈ 0.71:
    // downsampled but present
    assert(counts(Some("en")) > 10 && counts(Some("en")) < 45, counts.toString)
    assert(counts(Some("fr")) > 5 && counts(Some("fr")) < 20, counts.toString)
    // no helper columns leak; total rows strictly between min and input
    assert(mixed.columns.toSet == df.columns.toSet)
    // T=1 keeps the natural distribution untouched
    assert(Curation.temperatureMix(df, "doc_id", "lang", 1.0, "t").count() == 90)
  }

  test("domainMix keeps rate-1 domains fully and samples the rest") {
    val mixed = Curation.domainMix(docs, "doc_id", "source",
      rates = Map("src0" -> 1.0, "src1" -> 0.0), defaultRate = 0.5,
      salt = "m")
    val counts = mixed.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("src0") == 100) // rate 1.0: everything kept
    assert(!counts.contains("src1")) // rate 0.0: nothing kept
    // defaulted domains sampled around half
    assert(counts("src2") > 20 && counts("src2") < 80)
    assert(counts("src3") > 20 && counts("src3") < 80)
    // schema passes through (no helper columns leak)
    assert(mixed.columns.toSet == docs.columns.toSet)
  }

  test("chunkWithOverlap windows tokens with the declared overlap") {
    val doc = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val df = Seq((1L, doc), (2L, "single")).toDF("doc_id", "text")
    val chunks = Curation.chunkWithOverlap(df, "text",
        chunkTokens = 4, overlap = 2)
      .orderBy($"doc_id", $"chunk_index")
      .select($"doc_id", $"chunk_index", $"chunk_text", $"chunk_tokens")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    // doc 1: starts 0,2,4,6,8 → 5 chunks; neighbors share 2 tokens
    val d1 = chunks.filter(_._1 == 1L)
    assert(d1.map(_._3).toSeq == Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10", "w9 w10"))
    assert(d1.map(_._4).toSeq == Seq(4, 4, 4, 4, 2)) // short tail kept
    assert(d1.map(_._2).toSeq == Seq(0, 1, 2, 3, 4))
    // a document shorter than one chunk yields exactly itself
    val d2 = chunks.filter(_._1 == 2L)
    assert(d2.toSeq == Seq((2L, 0, "single", 1)))
    // every token appears in at least one chunk (no token lost)
    assert(d1.flatMap(_._3.split(" ")).toSet == (1 to 10).map(i => s"w$i").toSet)
  }

  test("budgetMix: weighted rates cap at 1, zero-weight domains drop") {
    val d = (0L until 400L).map(i => (i, s"src${i % 4}", 100L))
      .toDF("doc_id", "source", "toks") // 100 docs x 10k tokens per domain
    val out = Curation.budgetMix(d, "doc_id", "source", "toks",
      budget = 24000, weights = Map("src0" -> 1L, "src1" -> 5L),
      salt = "b")
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // src2/src3 unweighted -> gone
    assert(kept.keySet == Set("src0", "src1"))
    // src1 target = 24000*5/6 = 20000 > 10000 tokens -> rate 1, ALL kept
    assert(kept("src1") == 100L)
    // src0 target = 4000/10000 -> rate 0.4: expected ~40, hash-exact
    // determinism means the same salt always gives the same subset
    val again = Curation.budgetMix(d, "doc_id", "source", "toks",
      budget = 24000, weights = Map("src0" -> 1L, "src1" -> 5L),
      salt = "b").collect().map(_.getLong(0)).sorted
    assert(again === out.collect().map(_.getLong(0)).sorted)
    assert(kept("src0") > 20L && kept("src0") < 60L)
  }
  test("shuffleShard: a valid permutation, seed-stable, epoch-independent") {
    val df = (0L until 200L).toDF("id")
    val out = Curation.shuffleShard(df, "id", seed = "ep1", numShards = 4)
      .select($"shard", $"pos", $"id")
      .as[(Int, Int, Long)].collect()
    // every row lands in exactly one shard with contiguous 1-based pos
    assert(out.length == 200 && out.map(_._3).distinct.length == 200)
    out.groupBy(_._1).foreach { case (shard, rows) =>
      assert(shard >= 0 && shard < 4)
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length),
        s"shard $shard positions not contiguous")
    }
    // same seed → identical order; new seed → a different permutation
    val again = Curation.shuffleShard(df, "id", "ep1", 4)
      .select($"shard", $"pos", $"id").as[(Int, Int, Long)].collect()
    assert(again.sortBy(_._3).toSeq == out.sortBy(_._3).toSeq)
    val ep2 = Curation.shuffleShard(df, "id", "ep2", 4)
      .select($"shard", $"pos", $"id").as[(Int, Int, Long)].collect()
    assert(ep2.sortBy(_._3).toSeq != out.sortBy(_._3).toSeq,
      "a new epoch seed must draw a new permutation")
  }
}
