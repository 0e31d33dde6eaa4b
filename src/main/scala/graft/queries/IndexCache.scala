package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

import graft.operators.{Dedup, Search, Similarity}

/** Per-JVM registry of the PERSISTED index artifacts the ANN/dedup
  * queries probe: each index is trained+encoded+written once per
  * (kind, sf dir) and every query against it reads the stored Delta
  * tables only — the production shape, where a nightly build amortizes
  * across every probe. Index contents are fully deterministic (seeded
  * rounded-Lloyd training, fixed hash families), so WHICH query triggers
  * the build cannot affect any query's result; probe queries never
  * mutate a shared index (the append path is spec-covered in
  * IncrementalDedupIndexSpec).
  *
  * [[warm]] lets Bench pre-build outside the timed region, so per-query
  * timings separate the one-time build cost (reported by the
  * `*_index_build` queries, which always build fresh) from the recurring
  * probe cost. */
object IndexCache {
  private val built = new ConcurrentHashMap[String, String]()

  private def temp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** PQ(+coarse) index over `embeddings` (dim 64, m 4, ksub 8, 1 Lloyd
    * iteration; coarse: 16 cells, 1 iteration). */
  def pqIndex(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"pq:$dir", _ => {
      val p = temp("graft_pqidx")
      Similarity.writePqIndex(s, p, Tables.t(s, dir, "embeddings"),
        "vec_id", "embedding", dim = 64, m = 4, ksub = 8, trainIters = 1,
        coarseCells = 16, coarseIters = 1)
      p
    })

  /** IVF index over `embeddings` (16 cells, `trainIters` Lloyd
    * iterations — 0 = raw lowest-id seeds, 2 = the k-means variant). */
  def ivfIndex(s: SparkSession, dir: String, trainIters: Int): String =
    built.computeIfAbsent(s"ivf:$trainIters:$dir", _ => {
      val p = temp("graft_ivfidx")
      Similarity.writeIvfIndex(s, p, Tables.t(s, dir, "embeddings"),
        "vec_id", "embedding", nCells = 16, trainIters = trainIters)
      p
    })

  /** SQ8 (per-dimension int8 scalar-quantization) index over
    * `embeddings`. */
  def sq8Index(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"sq8:$dir", _ => {
      val p = temp("graft_sq8idx")
      Similarity.writeSq8Index(s, p, Tables.t(s, dir, "embeddings"),
        "vec_id", "embedding")
      p
    })

  /** MinHash-LSH dedup index over `documents` (3-word shingles, k 12,
    * 4 bands). Probe-only consumers: nothing appends to this copy. */
  def minhashIndex(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"mh:$dir", _ => {
      val p = temp("graft_lshidx")
      graft.delta.DeltaTable.write(
        Dedup.buildMinhashIndex(Tables.t(s, dir, "documents"),
          "doc_id", "text", shingleWidth = 3, k = 12, bands = 4),
        p, org.apache.spark.sql.SaveMode.Overwrite)
      p
    })

  /** PQ index trained+encoded over the EVEN vec_ids only — the frozen
    * base of the incremental-encode scenario: `ann_incremental_topk`
    * shallow-CLONES it per call and encodes the odd batch into the
    * clone, so the timed region is the incremental work (clone + encode
    * + probe), not the base build that a production corpus amortizes. */
  def pqIndexEven(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"pq-even:$dir", _ => {
      import org.apache.spark.sql.functions.col
      val p = temp("graft_pqeven")
      Similarity.writePqIndex(s, p,
        Tables.t(s, dir, "embeddings").filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", dim = 64, m = 4, ksub = 8, trainIters = 1,
        coarseCells = 16, coarseIters = 1)
      p
    })

  /** ExactSubstr `(h, occ)` artifact over documents with doc_id < 400 —
    * the corpus-so-far of the incremental substring scenario; probes
    * clone it per call and merge their batch counts into the clone. */
  def substrIndex(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"substr:$dir", _ => {
      import org.apache.spark.sql.functions.col
      val p = temp("graft_substridx")
      // corpus = 90% of documents; the nightly batch is the doc_id % 10
      // == 0 slice, so the batch:corpus ratio holds at every sf
      Dedup.buildSubstrIndex(s, p,
        Tables.t(s, dir, "documents").filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", minLen = 8)
      p
    })

  /** BM25 inverted-index artifact over `documents` (postings + stats
    * partials). Probe-only consumers; the append path is spec-covered in
    * SearchAndLineDedupSpec. */
  def bm25Index(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"bm25:$dir", _ => {
      val p = temp("graft_bm25idx")
      Search.buildPostingsIndex(s, Tables.t(s, dir, "documents"),
        "doc_id", "text", p)
      p
    })

  /** Zero-copy fork of a cached index (every subtable shallow-cloned):
    * mutation-bearing queries work on the fork, the warmed original
    * stays pristine for every other probe. */
  def cloneIndex(s: SparkSession, indexPath: String,
                 subTables: Seq[String]): String = {
    // per-call scratch (unlike the warmed base indexes): swept after the
    // sample; the shallow clone's data files belong to the base, so the
    // sweep removes only the clone's log + its own appended files
    val p = ScratchDirs.register(temp("graft_idxclone"))
    if (subTables.isEmpty) {
      graft.delta.DeltaTable.forPath(s, indexPath).cloneTo(s"$p/t")
      s"$p/t"
    } else {
      subTables.foreach { t =>
        graft.delta.DeltaTable.forPath(s, s"$indexPath/$t")
          .cloneTo(s"$p/$t")
      }
      p
    }
  }

  /** Pre-build every index (Bench calls this outside the timed region). */
  def warm(s: SparkSession, dir: String): Unit = {
    pqIndex(s, dir)
    ivfIndex(s, dir, 0)
    ivfIndex(s, dir, 2)
    sq8Index(s, dir)
    minhashIndex(s, dir)
    pqIndexEven(s, dir)
    substrIndex(s, dir)
    bm25Index(s, dir)
  }
}
