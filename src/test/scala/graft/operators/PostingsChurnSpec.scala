package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Churn/recovery story for the PERSISTED BM25 postings artifact —
  * the symmetry partner of IncrementalSubstrIndexSpec's compaction
  * tests: N small appends must (a) keep probe results bit-identical to
  * a batch rebuild, (b) degrade the file count when self-compaction is
  * opted out, and (c) recover through OPTIMIZE with verdicts unchanged.
  * The artifact DEFAULT is delta.autoOptimize.autoCompact=true
  * ([[Search.DefaultPostingsConfig]]). */
class PostingsChurnSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(ids: Range): Seq[(Long, String)] = ids.map { i =>
    (i.toLong,
      s"shared vocabulary token$i filler${i % 7} " +
        (if (i % 3 == 0) "signal beacon " else "") +
        s"common corpus words w${i % 5}")
  }

  private val queries = Seq(
    "q1" -> Seq("signal", "beacon"),
    "q2" -> Seq("common", "filler0"),
    "q3" -> Seq("token3", "w2"))

  private def probe(path: String): Set[Seq[Any]] =
    Search.bm25TopKIndexed(spark, path, queries, k = 5)
      .collect().map(_.toSeq).toSet

  test("N appends stay bit-identical to a batch rebuild; autoCompact " +
      "bounds the file count") {
    withTempDir { dir =>
      val ac = s"$dir/idx_ac"      // the DEFAULT (self-compacting)
      val plain = s"$dir/idx_plain" // opt-out twin: exposes accretion
      val noCompact = Map("delta.autoOptimize.autoCompact" -> "false")
      Search.buildPostingsIndex(spark,
        corpus(0 until 20).toDF("doc_id", "text"), "doc_id", "text", ac)
      Search.buildPostingsIndex(spark,
        corpus(0 until 20).toDF("doc_id", "text"), "doc_id", "text", plain,
        configuration = noCompact)
      (0 until 6).foreach { b =>
        val batch = corpus(100 + 3 * b until 100 + 3 * (b + 1))
          .toDF("doc_id", "text")
        Search.appendToPostingsIndex(spark, batch, "doc_id", "text", ac)
        Search.appendToPostingsIndex(spark, batch, "doc_id", "text", plain,
          configuration = noCompact)
        assert(probe(ac) == probe(plain), s"batch $b diverged under compaction")
      }
      // the grown artifact answers exactly like ONE batch build over the
      // full corpus — order of arrival must not matter
      val rebuilt = s"$dir/idx_rebuilt"
      Search.buildPostingsIndex(spark,
        corpus(0 until 20).union(corpus(100 until 118)).toDF("doc_id", "text"),
        "doc_id", "text", rebuilt)
      assert(probe(ac) == probe(rebuilt),
        "incremental artifact diverged from a batch rebuild")
      val nAc = graft.delta.DeltaLog.forTable(spark, s"$ac/postings")
        .update().numOfFiles
      val nPlain = graft.delta.DeltaLog.forTable(spark, s"$plain/postings")
        .update().numOfFiles
      assert(nAc < nPlain,
        s"autoCompact must bound accretion: $nAc vs $nPlain files")
    }
  }

  test("probe cost degrades under opt-out churn and OPTIMIZE recovers it " +
      "with verdicts unchanged") {
    withTempDir { dir =>
      val idx = s"$dir/idx"
      val noCompact = Map("delta.autoOptimize.autoCompact" -> "false")
      Search.buildPostingsIndex(spark,
        corpus(0 until 20).toDF("doc_id", "text"), "doc_id", "text", idx,
        configuration = noCompact)
      val filesInitial = graft.delta.DeltaLog
        .forTable(spark, s"$idx/postings").update().numOfFiles
      (0 until 5).foreach { b =>
        Search.appendToPostingsIndex(spark,
          corpus(200 + 2 * b until 200 + 2 * (b + 1)).toDF("doc_id", "text"),
          "doc_id", "text", idx, configuration = noCompact)
      }
      // degradation: every append adds files the probe's term-pruned
      // scan must still list and stat
      val filesBefore = graft.delta.DeltaLog
        .forTable(spark, s"$idx/postings").update().numOfFiles
      assert(filesBefore > filesInitial,
        s"appends must grow the file count: $filesInitial -> $filesBefore")
      val before = probe(idx)
      graft.delta.DeltaTable.forPath(spark, s"$idx/postings").compact()
      val filesAfter = graft.delta.DeltaLog
        .forTable(spark, s"$idx/postings").update().numOfFiles
      assert(filesAfter < filesBefore,
        s"OPTIMIZE must shrink the file count: $filesBefore -> $filesAfter")
      assert(probe(idx) == before, "OPTIMIZE changed probe verdicts")
      // stats partials stay batch-count-sized (never corpus-sized) and
      // sum to the true corpus totals after churn
      val stats = graft.delta.DeltaTable.forPath(spark, s"$idx/stats").toDF
      assert(stats.count() == 6) // initial + 5 appends
      assert(stats.agg(sum($"n_docs")).as[Long].head() == 30L)
    }
  }
}
