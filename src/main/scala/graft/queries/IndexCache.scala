package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

import graft.operators.{Dedup, Similarity}

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

  /** Pre-build every index (Bench calls this outside the timed region). */
  def warm(s: SparkSession, dir: String): Unit = {
    pqIndex(s, dir)
    ivfIndex(s, dir, 0)
    ivfIndex(s, dir, 2)
    sq8Index(s, dir)
    minhashIndex(s, dir)
  }
}
