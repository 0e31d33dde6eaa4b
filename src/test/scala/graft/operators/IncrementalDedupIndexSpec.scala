package graft.operators

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.delta.DeltaTable

/** The persisted-LSH-index contract of incremental dedup: a nightly batch
  * probes the STORED index artifact — the corpus text is never re-read,
  * re-tokenized or re-minhashed — and appends its own keys so the next
  * batch sees this one. The plan assertions are the point: correctness of
  * the pairs is already oracled (`dedup_incremental`); these specs prove
  * the 100 TB property (zero corpus-text scans per probe). */
class IncrementalDedupIndexSpec extends SparkSpec {

  private def corpusRows: Seq[(Long, String)] = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river shore"),
    (3L, "completely unrelated text about spark catalyst optimizer rules"),
    (4L, "another document concerning distributed shuffle partitioning design"),
    (5L, "a third corpus entry on columnar parquet encodings and pruning"))

  // joins get wrapped in AdaptiveSparkPlanExec (a leaf to collect());
  // recurse through its inputPlan to reach the real scan leaves
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

  test("persisted probe plans zero scans of the corpus text") {
    withTempDir { dir =>
      import spark.implicits._
      val corpusDir = s"$dir/corpus_text"
      val idxPath = s"$dir/lsh_index"
      corpusRows.toDF("doc_id", "text").write.parquet(corpusDir)

      val corpus = spark.read.parquet(corpusDir)
      DeltaTable.write(
        Dedup.buildMinhashIndex(corpus, "doc_id", "text", 3, 12, 4),
        idxPath, SaveMode.Overwrite)

      val batch = Seq(
        (101L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (102L, "fresh batch document that matches nothing in the corpus at all"))
        .toDF("doc_id", "text")
      val result = Dedup.incrementalMinhashLshPersisted(
        spark, idxPath, batch, "doc_id", "text", 3, 12, 4, 0.7)

      val scans = fileScans(result)
      assert(scans.nonEmpty, "expected file scans of the index table")
      assert(!scans.exists(s => scanPaths(s).contains("corpus_text")),
        s"probe plan must not scan the corpus text: " +
          scans.map(scanPaths).mkString("; "))
      assert(scans.forall(s => scanPaths(s).contains("lsh_index")),
        "every file scan must read the persisted index")

      // the candidate-producing face reads (id, bands) ONLY — parquet
      // column pruning keeps the wide shingle payload out of the probe
      assert(scans.exists(_.requiredSchema.fieldNames.toSet == Set("id", "bands")),
        s"expected a shingle-free probe scan; got " +
          scans.map(_.requiredSchema.fieldNames.mkString("(", ",", ")")).mkString("; "))

      val pairs = result.select("batch_id", "corpus_id").as[(Long, Long)]
        .collect().toSet
      assert(pairs.contains((101L, 1L)) && pairs.contains((101L, 2L)))
      assert(!pairs.exists(_._1 == 102L))
    }
  }

  test("probe matches the one-shot operator; append makes batch visible to the next batch") {
    withTempDir { dir =>
      import spark.implicits._
      val idxPath = s"$dir/lsh_index"
      val corpus = corpusRows.toDF("doc_id", "text")
      DeltaTable.write(
        Dedup.buildMinhashIndex(corpus, "doc_id", "text", 3, 12, 4),
        idxPath, SaveMode.Overwrite)

      val batch1 = Seq(
        (201L, "a freshly ingested note on columnar parquet encodings and pruning"),
        (202L, "unique nightly content with no neighbours anywhere in the index"))
        .toDF("doc_id", "text")
      val viaIndex = Dedup.incrementalMinhashLshPersisted(
        spark, idxPath, batch1, "doc_id", "text", 3, 12, 4, 0.7)
        .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
      val oneShot = Dedup.incrementalMinhashLsh(corpus, batch1,
        "doc_id", "text", 3, 12, 4, 0.7)
        .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
      assert(viaIndex == oneShot)

      // batch2 near-dups a BATCH1 doc (not an original-corpus doc): only
      // the appended index rows can produce this match
      val batch2 = Seq(
        (301L, "unique nightly content with no neighbours anywhere in the index"))
        .toDF("doc_id", "text")
      val second = Dedup.incrementalMinhashLshPersisted(
        spark, idxPath, batch2, "doc_id", "text", 3, 12, 4, 0.7)
        .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
      assert(second.contains((301L, 202L)),
        s"second probe must see the first batch's appended keys; got $second")

      // idempotent retry of an already-committed batch append is a no-op
      val before = DeltaTable.forPath(spark, idxPath).toDF.count()
      Dedup.incrementalMinhashLshPersisted(
        spark, idxPath, batch2, "doc_id", "text", 3, 12, 4, 0.7,
        idempotentTxn = Some(("nightly", 7L))).collect()
      Dedup.incrementalMinhashLshPersisted(
        spark, idxPath, batch2, "doc_id", "text", 3, 12, 4, 0.7,
        idempotentTxn = Some(("nightly", 7L))).collect()
      val after = DeltaTable.forPath(spark, idxPath).toDF.count()
      assert(after == before + 1,
        s"idempotent append must commit once: $before -> $after")
    }
  }

  test("autoCompact bounds the growing index's file count without changing probes") {
    withTempDir { dir =>
      import spark.implicits._
      val compacted = s"$dir/idx_ac"
      val plain = s"$dir/idx_plain"
      val corpus = corpusRows.toDF("doc_id", "text")
      val idx = Dedup.buildMinhashIndex(corpus, "doc_id", "text", 3, 12, 4)
      // the classic object-store accretion failure: one small file per
      // nightly/micro batch. delta.autoOptimize.autoCompact is the
      // in-band answer — each append bin-packs AFTER its commit, so the
      // artifact converges instead of accreting
      DeltaTable.write(idx, compacted, SaveMode.Overwrite,
        configuration = Map("delta.autoOptimize.autoCompact" -> "true"))
      DeltaTable.write(idx, plain, SaveMode.Overwrite)
      (0 until 6).foreach { b =>
        val batch = Seq((500L + b,
          s"micro batch number $b adds a brand new unique document entry $b"))
          .toDF("doc_id", "text")
        val viaCompacted = Dedup.incrementalMinhashLshPersisted(
          spark, compacted, batch, "doc_id", "text", 3, 12, 4, 0.7)
          .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
        val viaPlain = Dedup.incrementalMinhashLshPersisted(
          spark, plain, batch, "doc_id", "text", 3, 12, 4, 0.7)
          .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
        assert(viaCompacted == viaPlain,
          s"batch $b diverged under compaction: $viaCompacted vs $viaPlain")
      }
      val nCompacted =
        graft.delta.DeltaLog.forTable(spark, compacted).update().numOfFiles
      val nPlain =
        graft.delta.DeltaLog.forTable(spark, plain).update().numOfFiles
      assert(nPlain >= 7, s"plain index should accrete, saw $nPlain files")
      assert(nCompacted <= 2,
        s"autoCompact must bound accretion, saw $nCompacted files")
      // the bin-packed artifact still answers probes identically,
      // including against keys appended across the micro-batches
      val check = Seq((900L,
        "micro batch number 3 adds a brand new unique document entry 3!!"))
        .toDF("doc_id", "text")
      val ac = Dedup.incrementalMinhashLshPersisted(
        spark, compacted, check, "doc_id", "text", 3, 12, 4, 0.7)
        .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
      val pl = Dedup.incrementalMinhashLshPersisted(
        spark, plain, check, "doc_id", "text", 3, 12, 4, 0.7)
        .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
      assert(ac == pl)
      assert(ac.contains((900L, 503L)),
        s"probe must reach the batch-appended keys after compaction: $ac")
    }
  }

  test("streaming ingest dedups each micro-batch against the growing index") {
    withTempDir { dir =>
      import org.apache.spark.sql.functions.col
      import spark.implicits._
      val src = s"$dir/src"
      val idxPath = s"$dir/idx"
      val outPath = s"$dir/matches"
      val ckpt = s"$dir/ckpt"

      DeltaTable.write(
        Dedup.buildMinhashIndex(corpusRows.toDF("doc_id", "text"),
          "doc_id", "text", 3, 12, 4),
        idxPath, SaveMode.Overwrite)
      // arriving documents stream out of a Delta source table; each
      // micro-batch probes the PERSISTED index and appends its own keys —
      // the nightly-ingest shape as a continuous pipeline, exactly-once
      // under batch replay via per-table SetTransaction keys
      DeltaTable.write(
        Seq((401L, "the quick brown fox jumps over the lazy dog near the river bank"))
          .toDF("doc_id", "text"), src)
      val q = spark.readStream.format("graft-delta").load(src)
        .writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            val matches = Dedup.incrementalMinhashLshPersisted(
              spark, idxPath, batch, "doc_id", "text", 3, 12, 4, 0.7,
              idempotentTxn = Some(("stream-dedup-idx", batchId)))
            DeltaTable.write(matches, outPath,
              idempotentTxn = Some(("stream-dedup-out", batchId)))
            ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      try {
        q.processAllAvailable()
        // batch 2 near-dups the STREAMED doc 401, not the original corpus:
        // only the index rows appended by batch 1 can produce this match
        DeltaTable.write(
          Seq((402L, "the quick brown fox jumps over the lazy dog near the river bank!!"))
            .toDF("doc_id", "text"), src)
        q.processAllAvailable()
      } finally q.stop()

      val pairs = DeltaTable.forPath(spark, outPath).toDF
        .select(col("batch_id"), col("corpus_id")).as[(Long, Long)]
        .collect().toSet
      assert(pairs.contains((401L, 1L)) && pairs.contains((401L, 2L)),
        s"first batch must match the corpus: $pairs")
      assert(pairs.contains((402L, 401L)),
        s"second batch must match the first batch through the index: $pairs")
    }
  }
}
