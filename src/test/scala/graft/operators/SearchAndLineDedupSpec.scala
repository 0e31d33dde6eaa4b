package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Search.bm25TopK]] and [[Dedup.lineDedup]] semantics on hand-built
  * corpora (the oracled queries prove cross-engine equality; these pin
  * the ALGORITHM against hand-computed expectations). */
class SearchAndLineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("lineDedup counts corpus-wide occurrences; blank lines never dup") {
    val lines = Seq(
      (1L, 0, "COPYRIGHT 2026 ACME"),
      (1L, 1, "unique content one"),
      (1L, 2, ""),
      (2L, 0, "COPYRIGHT 2026 ACME"),
      (2L, 1, "  COPYRIGHT 2026 ACME  "), // trims equal
      (2L, 2, "   "),
      (3L, 0, "unique content three")
    ).toDF("doc_id", "line_idx", "line")
    val out = Dedup.lineDedup(lines, "line")
      .select($"doc_id", $"line_idx", $"line_occ")
      .as[(Long, Int, Long)].collect().toMap2
    assert(out((1L, 0)) == 3) // boilerplate counted across docs + trim
    assert(out((2L, 0)) == 3 && out((2L, 1)) == 3)
    assert(out((1L, 1)) == 1 && out((3L, 0)) == 1)
    assert(out((1L, 2)) == 1 && out((2L, 2)) == 1,
      "blank lines must not count as duplicates of each other")
  }

  private implicit class Tuples3(rows: Array[(Long, Int, Long)]) {
    def toMap2: Map[(Long, Int), Long] =
      rows.map { case (d, i, o) => (d, i) -> o }.toMap
  }

  test("ad-hoc bm25TopK tokenizes the corpus in exactly ONE pass") {
    // a counting expression BELOW the scope-local cache point: each
    // corpus pass evaluates it once per row, cache reuse does not — so
    // the accumulator equals n_docs iff the call makes a single pass
    // (the r8 design made three)
    val acc = spark.sparkContext.longAccumulator("bm25DocReads")
    val reads = udf((s: String) => { acc.add(1); s }).asNondeterministic()
    val n = 500L
    val docs = spark.range(n).selectExpr("id as doc_id",
      "concat('common w', cast(id % 13 as string), ' ', " +
        "case when id % 5 = 0 then 'rare' else 'filler' end) as text")
      .withColumn("text", reads($"text"))
    val res = Search.bm25TopK(spark, docs, "doc_id", "text",
      Seq("q1" -> Seq("rare", "common"), "q2" -> Seq("filler")), k = 5)
    assert(res.count() == 10)
    assert(acc.value == n,
      s"corpus passes = ${acc.value.toDouble / n}; must be exactly 1")
  }

  test("bm25TopK ranks by tf saturation, length norm, and rarity") {
    // 4 docs, 8 tokens each (avgdl = dl for all: length norm neutral).
    // 'rare' appears in 1 doc, 'common' in all 4.
    val docs = Seq(
      (1L, "common a b c d e f g"),
      (2L, "common common common a b c d e"),
      (3L, "common rare a b c d e f"),
      (4L, "common a rare b c rare d e")
    ).toDF("id", "text")

    // single term, equal dl: ranking is by tf alone (saturating, but
    // monotone in tf) — doc 2 (tf 3) first, ties broken by id
    val byTf = Search.bm25TopK(spark, docs, "id", "text",
      Seq("q" -> Seq("common")), k = 4)
      .orderBy($"rank").select($"doc_id").as[Long].collect().toSeq
    assert(byTf == Seq(2L, 1L, 3L, 4L),
      s"tf 3 first, then tf 1 in id order: $byTf")

    // rare term dominates: docs with 'rare' outrank higher-tf 'common'
    val mixed = Search.bm25TopK(spark, docs, "id", "text",
      Seq("q" -> Seq("common", "rare")), k = 4)
      .orderBy($"rank").select($"doc_id").as[Long].collect().toSeq
    assert(mixed.take(2).toSet == Set(3L, 4L),
      s"rare-term docs must lead: $mixed")
    assert(mixed(0) == 4L, s"tf 2 of the rare term outranks tf 1: $mixed")

    // k truncates; scores strictly positive; rank dense from 1
    val top1 = Search.bm25TopK(spark, docs, "id", "text",
      Seq("q" -> Seq("rare")), k = 1).collect()
    assert(top1.length == 1 && top1.head.getAs[Int]("rank") == 1)
    assert(top1.head.getAs[Double]("score") > 0.0)

    // a term absent from the corpus contributes nothing; an all-absent
    // query returns no rows rather than zero-scored noise
    val none = Search.bm25TopK(spark, docs, "id", "text",
      Seq("q" -> Seq("zzz")), k = 3).collect()
    assert(none.isEmpty)
  }

  private def fileScans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    def go(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          go(a.inputPlan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(go)
      }
    go(df.queryExecution.executedPlan)
  }

  test("indexed probe equals ad-hoc scoring, scans only the artifact, " +
      "and appends idempotently") {
    withTempDir { dir =>
      import spark.implicits._
      val corpusDir = s"$dir/corpus_text"
      val idxPath = s"$dir/bm25_index"
      val docs = (1L to 40L)
        .map(i => (i, s"common w$i x${i % 7} scan ${if (i % 5 == 0) "rare" else "filler"}"))
        .toDF("doc_id", "text")
      docs.write.parquet(corpusDir)
      val corpus = spark.read.parquet(corpusDir)

      Search.buildPostingsIndex(spark, corpus, "doc_id", "text", idxPath)
      val qs = Seq("q1" -> Seq("rare", "scan"), "q2" -> Seq("common"))
      val adhoc = Search.bm25TopK(spark, corpus, "doc_id", "text", qs, k = 7)
      val indexed = Search.bm25TopKIndexed(spark, idxPath, qs, k = 7)
      assert(indexed.collect().toSet == adhoc.collect().toSet,
        "artifact-served ranking must equal the ad-hoc computation")

      // 100 TB property: the probe reads the artifact, never the corpus
      val scans = fileScans(indexed)
      assert(scans.nonEmpty)
      assert(scans.forall(_.relation.location.rootPaths.mkString(",")
          .contains("bm25_index")),
        s"probe must scan only the index: ${scans.map(_.relation.location.rootPaths.mkString(","))}")
      // and the term filter is pushed into the postings scan
      val postingsScan = scans.find(
        _.relation.location.rootPaths.mkString(",").contains("postings")).get
      assert(postingsScan.metadata("PushedFilters").contains("In(term"),
        postingsScan.metadata("PushedFilters"))

      // idempotent append: a replayed batch commit is a no-op
      val batch = Seq((100L, "rare rare scan brand new document")).toDF("doc_id", "text")
      Search.appendToPostingsIndex(spark, batch, "doc_id", "text", idxPath,
        idempotentTxn = Some(("bm25-ingest", 1L)))
      val after1 = Search.bm25TopKIndexed(spark, idxPath,
        Seq("q" -> Seq("rare")), k = 1).collect().head
      assert(after1.getAs[Long]("doc_id") == 100L,
        "the appended doc's double-rare tf must now lead")
      Search.appendToPostingsIndex(spark, batch, "doc_id", "text", idxPath,
        idempotentTxn = Some(("bm25-ingest", 1L))) // replay
      val nPostings = graft.delta.DeltaTable
        .forPath(spark, s"$idxPath/postings").toDF
        .filter($"doc_id" === 100L).count()
      assert(nPostings == 5L, // 5 distinct terms in the batch doc
        s"replayed append must not duplicate postings, got $nPostings")
    }
  }

  test("streaming postings ingest: micro-batches append idempotently and " +
      "serve the batch rebuild's exact ranking") {
    withTempDir { dir =>
      import org.apache.spark.sql.streaming.Trigger
      val src = s"$dir/doc_stream"
      val idx = s"$dir/stream_idx"
      val ckpt = s"$dir/ckpt"
      def doc(i: Long) =
        (i, s"common w$i ${if (i % 3 == 0) "rare" else "filler"}")
      val seed = (1L to 10L).map(doc).toDF("doc_id", "text")
      graft.delta.DeltaTable.write(seed, src) // version 0
      Search.buildPostingsIndex(spark, seed, "doc_id", "text", idx)
      def drain(): Unit = {
        val q = spark.readStream.format("graft-delta")
          .option("startingVersion", "1").load(src)
          .writeStream.foreachBatch {
            (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
              Search.appendToPostingsIndex(spark, batch, "doc_id", "text",
                idx, idempotentTxn = Some(("bm25-stream", batchId)))
              ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(60000)
      }
      graft.delta.DeltaTable.write(
        (11L to 15L).map(doc).toDF("doc_id", "text"), src) // v1 -> batch 0
      drain()
      graft.delta.DeltaTable.write(
        (16L to 20L).map(doc).toDF("doc_id", "text"), src) // v2 -> batch 1
      drain()

      // a REPLAY of batch 1 (sink restart re-delivering) is a no-op on
      // both the postings and the stats partials
      val postingsBefore = graft.delta.DeltaTable
        .forPath(spark, s"$idx/postings").toDF.count()
      Search.appendToPostingsIndex(spark,
        (16L to 20L).map(doc).toDF("doc_id", "text"), "doc_id", "text",
        idx, idempotentTxn = Some(("bm25-stream", 1L)))
      assert(graft.delta.DeltaTable.forPath(spark, s"$idx/postings")
        .toDF.count() == postingsBefore, "replayed batch must be a no-op")

      // the streamed artifact serves EXACTLY what a from-scratch build
      // over the union serves
      val rebuilt = s"$dir/rebuilt_idx"
      Search.buildPostingsIndex(spark,
        (1L to 20L).map(doc).toDF("doc_id", "text"), "doc_id", "text",
        rebuilt)
      val qs = Seq("q1" -> Seq("rare", "common"), "q2" -> Seq("filler"))
      val streamed = Search.bm25TopKIndexed(spark, idx, qs, k = 8)
        .collect().toSet
      val batch = Search.bm25TopKIndexed(spark, rebuilt, qs, k = 8)
        .collect().toSet
      assert(streamed == batch,
        "streamed index must hash-match the batch rebuild")
    }
  }

  test("rrfFuse: exact scaled-integer sums, single-run docs, tie-break") {
    // run A ranks docs 10, 11, 12; run B ranks 11, 10, 13
    val runA = Seq(("q", 10L, 1), ("q", 11L, 2), ("q", 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val runB = Seq(("q", 11L, 1), ("q", 10L, 2), ("q", 13L, 3))
      .toDF("query_id", "doc_id", "rank")
    val out = Search.rrfFuse(Seq(runA, runB), k = 4, rrfK = 60)
      .orderBy($"rank")
      .select($"doc_id", $"rrf_score").as[(Long, Long)].collect().toSeq
    def c(r: Int) = 1000000000L / (60L + r)
    // both 10 and 11 have {rank 1, rank 2} contributions — an exact
    // score TIE that must break by doc_id; 12 and 13 are single-run
    // rank-3 docs, again tied, again id order
    assert(out == Seq(
      10L -> (c(1) + c(2)), 11L -> (c(1) + c(2)),
      12L -> c(3), 13L -> c(3)), s"got $out")
  }

  test("rrfFuse fuses per query_id independently") {
    val runA = Seq(("q1", 1L, 1), ("q2", 2L, 1))
      .toDF("query_id", "doc_id", "rank")
    val runB = Seq(("q1", 1L, 1), ("q2", 3L, 1))
      .toDF("query_id", "doc_id", "rank")
    val out = Search.rrfFuse(Seq(runA, runB), k = 1)
      .select($"query_id", $"doc_id").as[(String, Long)].collect().toMap
    assert(out == Map("q1" -> 1L, "q2" -> 2L),
      s"q2's 2 and 3 tie on score and break by id: $out")
  }
}
