package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property fuzzing of the PERSISTED-artifact substring probe: on random
  * small-alphabet corpora split into corpus-so-far + incoming batch, the
  * incremental verdicts (stored counts + in-batch counts) must equal the
  * full recompute over corpus ∪ batch restricted to the batch's
  * documents — the equivalence the scaladoc argues, machine-checked
  * across dense-duplicate configurations (cross-set duplicates,
  * in-batch self-repeats, batch-only duplicates, empty docs). */
class IncrementalSubstrFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def randomDoc(rnd: scala.util.Random): String = {
    val n = rnd.nextInt(15)
    Seq.fill(n)(Seq("x", "y", "z")(rnd.nextInt(3))).mkString(" ")
  }

  test("random corpus/batch splits: incremental equals restricted recompute (fixed seed)") {
    val rnd = new scala.util.Random(13L)
    (1 to 25).foreach { trial =>
      withTempDir { dir =>
        val nCorpus = 1 + rnd.nextInt(4)
        val nBatch = 1 + rnd.nextInt(3)
        val corpus = (0 until nCorpus).map(i => (i.toLong, randomDoc(rnd)))
        val batch = (0 until nBatch).map(i => (100L + i, randomDoc(rnd)))
        val minCount = 2 + rnd.nextInt(2)
        val idx = s"$dir/idx"
        Dedup.buildSubstrIndex(spark, idx, corpus.toDF("doc_id", "text"),
          "doc_id", "text", minLen = 3)
        val inc = Dedup.incrementalSubstrSpans(spark, idx,
            batch.toDF("doc_id", "text"), "doc_id", "text",
            minLen = 3, minCount = minCount)
          .collect().map(_.toSeq).toSet
        val full = Dedup.exactSubstrSpans(
            (corpus ++ batch).toDF("doc_id", "text"), "doc_id", "text",
            minLen = 3, minCount = minCount)
          .filter(col("id") >= 100L)
          .collect().map(_.toSeq).toSet
        assert(inc == full,
          s"trial $trial diverged (minCount=$minCount):\n" +
            s"  corpus=$corpus\n  batch=$batch\n  inc=$inc\n  full=$full")
        // and a second batch sees the first through the artifact: replay
        // the SAME batch — every window with >= 1 occurrence anywhere is
        // now duplicated for it (its first copy is stored)
        val replay = Dedup.incrementalSubstrSpans(spark, idx,
            batch.toDF("doc_id", "text"), "doc_id", "text",
            minLen = 3, minCount = 2)
          .collect().map(_.toSeq).toSet
        val allWindows = Dedup.exactSubstrSpans(
            (corpus ++ batch ++ batch.map { case (i, t) => (i + 200, t) })
              .toDF("doc_id", "text"), "doc_id", "text",
            minLen = 3, minCount = 2)
          .filter(col("id") >= 100L && col("id") < 200L)
          .collect().map(_.toSeq).toSet
        assert(replay == allWindows,
          s"trial $trial replay diverged:\n  got=$replay\n  want=$allWindows")
      }
    }
  }
}
