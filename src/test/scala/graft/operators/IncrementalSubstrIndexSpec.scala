package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.delta.DeltaTable

/** The persisted ExactSubstr artifact: corpus window counts hash once
  * into a (h, occ) Delta table; each batch probes the stored counts and
  * MERGEs its own in — the corpus text is never re-scanned (the
  * round-7 "watch" on per-invocation occurrence tables). Span
  * correctness is oracled (`dedup_substr_incremental`); these specs pin
  * the equivalence contract, the plan shape, idempotency, growth across
  * batches, and compaction of the growing artifact. */
class IncrementalSubstrIndexSpec extends SparkSpec {

  // 8-token duplicated runs shared across specific docs; minLen = 4
  private val phrase = "alpha beta gamma delta epsilon zeta eta theta"
  private def corpusRows: Seq[(Long, String)] = Seq(
    (1L, s"intro words then $phrase and a tail"),
    (2L, s"different opening $phrase closing remark here"),
    (3L, "entirely unrelated text with no duplicated windows at all today"),
    (4L, "short doc"))

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

  private def scanPaths(s: FileSourceScanExec): String =
    s.relation.location.rootPaths.mkString(",")

  test("incremental spans equal the full recompute restricted to the batch") {
    withTempDir { dir =>
      import spark.implicits._
      val corpus = corpusRows.toDF("doc_id", "text")
      // batch 101 duplicates a CORPUS phrase; 102 self-repeats (in-batch
      // duplication with occ 2 entirely inside one doc); 103 is clean
      val batch = Seq(
        (101L, s"new arrival copying $phrase verbatim from corpus"),
        (102L, s"self repeat $phrase again $phrase to close"),
        (103L, "clean newcomer with nothing duplicated anywhere in sight"))
        .toDF("doc_id", "text")
      val idx = s"$dir/substr_idx"
      Dedup.buildSubstrIndex(spark, idx, corpus, "doc_id", "text", minLen = 4)
      val inc = Dedup.incrementalSubstrSpans(spark, idx, batch,
          "doc_id", "text", minLen = 4, minCount = 2)
        .collect().map(_.toSeq).toSet
      val full = Dedup.exactSubstrSpans(corpus.unionByName(batch),
          "doc_id", "text", minLen = 4, minCount = 2)
        .filter(col("id") >= 100L)
        .collect().map(_.toSeq).toSet
      assert(inc == full, s"incremental diverged:\n  inc:  $inc\n  full: $full")
      assert(inc.exists(_.head == 101L) && inc.exists(_.head == 102L))
      assert(!inc.exists(_.head == 103L))
    }
  }

  test("probe plans scan the index and batch only, never the corpus text") {
    withTempDir { dir =>
      import spark.implicits._
      val corpusDir = s"$dir/corpus_text"
      corpusRows.toDF("doc_id", "text").write.parquet(corpusDir)
      val idx = s"$dir/substr_idx"
      Dedup.buildSubstrIndex(spark, idx, spark.read.parquet(corpusDir),
        "doc_id", "text", minLen = 4)
      val batch = Seq((201L, s"probe doc with $phrase inside"))
        .toDF("doc_id", "text")
      val result = Dedup.incrementalSubstrSpans(spark, idx, batch,
        "doc_id", "text", minLen = 4, minCount = 2)
      val scans = fileScans(result)
      assert(scans.nonEmpty, "expected scans of the index table")
      assert(!scans.exists(s => scanPaths(s).contains("corpus_text")),
        s"probe must not scan the corpus text: " +
          scans.map(scanPaths).mkString("; "))
      assert(scans.forall(s => scanPaths(s).contains("substr_idx")))
      assert(result.collect().nonEmpty)
    }
  }

  test("each batch's merged counts are visible to the next; retries are idempotent") {
    withTempDir { dir =>
      import spark.implicits._
      val idx = s"$dir/substr_idx"
      Dedup.buildSubstrIndex(spark, idx,
        corpusRows.toDF("doc_id", "text"), "doc_id", "text", minLen = 4)
      val novel = "red orange yellow green blue indigo violet ultraviolet"
      // batch 1 introduces a NOVEL phrase (occ 1 — not yet duplicated)
      val b1 = Seq((301L, s"first sighting of $novel here"))
        .toDF("doc_id", "text")
      val s1 = Dedup.incrementalSubstrSpans(spark, idx, b1,
        "doc_id", "text", minLen = 4, minCount = 2).collect()
      assert(s1.isEmpty, s"novel phrase must not be duplicated yet: ${s1.toSeq}")
      // batch 2 repeats it: only the MERGED batch-1 counts can fire this
      val b2 = Seq((302L, s"second sighting of $novel now"))
        .toDF("doc_id", "text")
      val s2 = Dedup.incrementalSubstrSpans(spark, idx, b2,
        "doc_id", "text", minLen = 4, minCount = 2).collect()
      assert(s2.nonEmpty,
        "batch 2 must see batch 1's counts through the artifact")

      // idempotent replay: same (appId, version) folds once AND the
      // retry returns the FIRST attempt's verdicts — a unique batch
      // window must not count its own already-appended copy and come
      // back a false duplicate
      val before = DeltaTable.forPath(spark, idx).toDF
        .agg(sum(col("occ"))).head().getLong(0)
      val b3 = Seq((303L, "replayed nightly batch content wholly unique"))
        .toDF("doc_id", "text")
      val attempt1 = Dedup.incrementalSubstrSpans(spark, idx, b3,
        "doc_id", "text", minLen = 4, minCount = 2,
        idempotentTxn = Some(("nightly-substr", 9L)))
        .collect().map(_.toSeq).toSet
      val mid = DeltaTable.forPath(spark, idx).toDF
        .agg(sum(col("occ"))).head().getLong(0)
      val attempt2 = Dedup.incrementalSubstrSpans(spark, idx, b3,
        "doc_id", "text", minLen = 4, minCount = 2,
        idempotentTxn = Some(("nightly-substr", 9L)))
        .collect().map(_.toSeq).toSet
      val after = DeltaTable.forPath(spark, idx).toDF
        .agg(sum(col("occ"))).head().getLong(0)
      assert(mid > before && after == mid,
        s"replay must fold once: $before -> $mid -> $after")
      assert(attempt1.isEmpty,
        s"a wholly unique batch has no duplicated spans: $attempt1")
      assert(attempt2 == attempt1,
        s"the retry must replay the first attempt's verdicts: $attempt2")
    }
  }

  test("autoCompact bounds the growing artifact without changing verdicts") {
    withTempDir { dir =>
      import spark.implicits._
      val compacted = s"$dir/idx_ac"
      val plain = s"$dir/idx_plain"
      val corpus = corpusRows.toDF("doc_id", "text")
      // `compacted` exercises the DEFAULT build (autoCompact on since
      // r9); `plain` opts out to expose the unbounded accretion
      Dedup.buildSubstrIndex(spark, compacted, corpus, "doc_id", "text",
        minLen = 4)
      Dedup.buildSubstrIndex(spark, plain, corpus, "doc_id", "text",
        minLen = 4,
        configuration = Map("delta.autoOptimize.autoCompact" -> "false"))
      (0 until 6).foreach { b =>
        val batch = Seq((500L + b,
          s"micro batch $b repeating $phrase for the verdict check"))
          .toDF("doc_id", "text")
        val viaAc = Dedup.incrementalSubstrSpans(spark, compacted, batch,
          "doc_id", "text", minLen = 4, minCount = 2)
          .collect().map(_.toSeq).toSet
        val viaPlain = Dedup.incrementalSubstrSpans(spark, plain, batch,
          "doc_id", "text", minLen = 4, minCount = 2)
          .collect().map(_.toSeq).toSet
        assert(viaAc == viaPlain, s"batch $b diverged under compaction")
        assert(viaAc.nonEmpty)
      }
      val nAc = graft.delta.DeltaLog.forTable(spark, compacted)
        .update().numOfFiles
      val nPlain = graft.delta.DeltaLog.forTable(spark, plain)
        .update().numOfFiles
      assert(nAc < nPlain,
        s"autoCompact must bound accretion: $nAc vs $nPlain files")
    }
  }

  test("compaction re-aggregates partial count rows; verdicts unchanged") {
    withTempDir { dir =>
      import spark.implicits._
      val idx = s"$dir/substr_idx"
      Dedup.buildSubstrIndex(spark, idx,
        corpusRows.toDF("doc_id", "text"), "doc_id", "text", minLen = 4)
      // three appended batches multiply the (h, occ) row multiplicity
      (0 until 3).foreach { b =>
        Dedup.incrementalSubstrSpans(spark, idx,
          Seq((600L + b, s"every batch repeats $phrase faithfully"))
            .toDF("doc_id", "text"),
          "doc_id", "text", minLen = 4, minCount = 2).collect()
      }
      // an identical twin, compacted: the same probe must see the same
      // verdicts off summed-partials and re-aggregated rows alike.
      // autoCompact explicitly OFF so the file-count degradation under
      // churn is observable — and provably recovered by the compaction
      val idx2 = s"$dir/substr_idx2"
      Dedup.buildSubstrIndex(spark, idx2,
        corpusRows.toDF("doc_id", "text"), "doc_id", "text", minLen = 4,
        configuration = Map("delta.autoOptimize.autoCompact" -> "false"))
      val filesInitial = graft.delta.DeltaLog.forTable(spark, idx2)
        .update().numOfFiles
      (0 until 3).foreach { b =>
        Dedup.incrementalSubstrSpans(spark, idx2,
          Seq((600L + b, s"every batch repeats $phrase faithfully"))
            .toDF("doc_id", "text"),
          "doc_id", "text", minLen = 4, minCount = 2).collect()
      }
      // probe plans DEGRADE with churn: every append adds files the
      // probe's index scan must open...
      val filesBefore = graft.delta.DeltaLog.forTable(spark, idx2)
        .update().numOfFiles
      assert(filesBefore > filesInitial,
        s"appends must grow the file count: $filesInitial -> $filesBefore")
      val before = DeltaTable.forPath(spark, idx2).toDF.count()
      Dedup.compactSubstrIndex(spark, idx2)
      // ...and compaction RECOVERS the probe cost on both axes
      val filesAfter = graft.delta.DeltaLog.forTable(spark, idx2)
        .update().numOfFiles
      assert(filesAfter < filesBefore,
        s"compaction must shrink the file count: $filesBefore -> $filesAfter")
      val after = DeltaTable.forPath(spark, idx2).toDF.count()
      assert(after < before, s"compaction must shrink rows: $before -> $after")
      // one row per hash right after compaction (probes below append)
      val dups0 = DeltaTable.forPath(spark, idx2).toDF
        .groupBy(col("h")).count().filter(col("count") > 1).count()
      assert(dups0 == 0)
      val probe = Seq((700L, s"final probe also carries $phrase inside"))
        .toDF("doc_id", "text")
      val viaPartials = Dedup.incrementalSubstrSpans(spark, idx, probe,
        "doc_id", "text", minLen = 4, minCount = 2)
        .collect().map(_.toSeq).toSet
      val viaCompacted = Dedup.incrementalSubstrSpans(spark, idx2, probe,
        "doc_id", "text", minLen = 4, minCount = 2)
        .collect().map(_.toSeq).toSet
      assert(viaPartials == viaCompacted && viaPartials.nonEmpty)
    }
  }

  test("streaming ingest probes and grows the artifact per micro-batch") {
    withTempDir { dir =>
      import org.apache.spark.sql.streaming.Trigger
      import spark.implicits._
      val src = s"$dir/src"
      val idx = s"$dir/idx"
      val out = s"$dir/spans"
      val ckpt = s"$dir/ckpt"
      Dedup.buildSubstrIndex(spark, idx,
        corpusRows.toDF("doc_id", "text"), "doc_id", "text", minLen = 4)
      val novel = "umber sienna ochre viridian cerulean madder alizarin gamboge"
      def drain(): Unit = {
        val q = spark.readStream.format("graft-delta").load(src)
          .writeStream.foreachBatch {
            (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
              val spans = Dedup.incrementalSubstrSpans(spark, idx, batch,
                "doc_id", "text", minLen = 4, minCount = 2,
                idempotentTxn = Some(("stream-substr-idx", batchId)))
              DeltaTable.write(spans, out,
                idempotentTxn = Some(("stream-substr-out", batchId)))
              ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(60000)
      }
      // batch 1: the phrase is NOVEL — no spans may fire
      DeltaTable.write(
        Seq((801L, s"first streamed sighting of $novel here"))
          .toDF("doc_id", "text"), src)
      drain()
      assert(DeltaTable.forPath(spark, out).toDF.count() == 0,
        "a first occurrence is not a duplicate")
      // batch 2 repeats it: only batch 1's counts in the artifact can fire
      DeltaTable.write(
        Seq((802L, s"second streamed sighting of $novel now"))
          .toDF("doc_id", "text"), src)
      drain()
      val spans = DeltaTable.forPath(spark, out).toDF
        .select(col("id")).as[Long].collect().toSet
      assert(spans == Set(802L),
        s"batch 2 must dedup against batch 1 through the artifact: $spans")
    }
  }

  test("indexed decontamination equals the ad-hoc operator") {
    withTempDir { dir =>
      import spark.implicits._
      val bench = Seq(
        (1L, s"benchmark question containing $phrase exactly"),
        (2L, "another benchmark item nothing special")).toDF("bid", "btext")
      val corpus = Seq(
        (10L, s"corpus doc leaking $phrase straight from the benchmark"),
        (11L, "honest corpus document with original content only"))
        .toDF("doc_id", "text")
      val idx = s"$dir/bench_idx"
      Dedup.buildBenchWindowIndex(spark, idx, bench, "bid", "btext",
        minLen = 4)
      val viaIdx = Dedup.substrContaminationIndexed(spark, idx, corpus,
        "doc_id", "text", minLen = 4).collect().map(_.toSeq).toSet
      val adHoc = Dedup.exactSubstrContamination(corpus, "doc_id", "text",
        bench, "bid", "btext", minLen = 4).collect().map(_.toSeq).toSet
      assert(viaIdx == adHoc)
      assert(viaIdx.exists(r => r.head == 10L && r(2).asInstanceOf[Long] > 0))
    }
  }
}
