package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.tokens

/** Exact corpus heavy hitters via a Misra–Gries sketch pass plus an
  * exact verification pass — the bounded-shuffle alternative to
  * `text_vocab_topk`'s full vocabulary aggregation.
  *
  * A full `groupBy(token)` shuffles the ENTIRE vocabulary (web-scale
  * corpora: billions of distinct tokens) to answer a question about the
  * handful of tokens above a frequency threshold. The sketch pass caps
  * what crosses the wire at `capacity` counters per partition
  * regardless of corpus size; the verify pass then aggregates ONLY the
  * ≤ `capacity` surviving candidates (everything else combines into one
  * overflow group map-side), so neither pass shuffles vocabulary-sized
  * state. Two scans of the input is the algorithm's honest price — the
  * output is EXACT, not approximate, because the sketch only ever
  * proposes candidates and the decision runs on true counts.
  *
  * Correctness chain (partitioning-independent output):
  *  - per-partition Misra–Gries with capacity `c` undercounts any item
  *    by at most `n_p / (c+1)` of its partition's `n_p` items;
  *  - pairwise merges (sum matching counters, then subtract the
  *    (c+1)-largest count and drop ≤ 0 — Agarwal et al., Mergeable
  *    Summaries, PODS'12) preserve that bound additively, so the final
  *    summary undercounts by at most `n / (c+1)` over all `n` tokens;
  *  - an item with true count > n/k where k ≤ c therefore keeps a
  *    positive counter and SURVIVES into the candidate set — the sketch
  *    can miss only non-qualifying items, which the exact pass would
  *    discard anyway;
  *  - the final filter `cnt * k > n` is pure integer arithmetic: no
  *    engine-specific division or rounding can flip a boundary row.
  */
object HeavyHitters {

  /** Tokens of `textCol` whose exact corpus frequency strictly exceeds
    * `1/k` of all tokens: rows `(tok, cnt, n)` with `cnt * k > n`.
    * Sketch capacity defaults to `k` (the minimum that guarantees
    * recall); raising it only reduces verify-pass candidates. */
  def frequentTokens(df: DataFrame, textCol: String, k: Int,
                     capacity: Int = 0): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val c = if (capacity <= 0) k else capacity
    require(c >= k, s"sketch capacity $c cannot be below k=$k (recall bound)")
    val spark = df.sparkSession
    import spark.implicits._

    val items = InputWidth.widen(df)
      .select(explode(tokens(col(textCol))).as("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Sketch pass: one Misra–Gries summary per partition, merged
    // pairwise. treeReduce materializes ONE ≤ c-entry map on the driver
    // (bounded by the caller's capacity, not by data size — same driver
    // contract as the ANN centroid tables).
    val summaries = items.as[String].rdd
      .mapPartitions(it => Iterator.single(partitionSummary(it, c)))
    val merged =
      if (summaries.isEmpty()) Map.empty[String, Long]
      else summaries.treeReduce((a, b) => mergeSummaries(a, b, c))
    val candidates = merged.keySet.toSeq

    // Verify pass: exact counts for candidates only. Non-candidates all
    // combine into ONE null-keyed overflow group map-side, so the
    // shuffle carries ≤ c+1 groups per mapper AND the same aggregation
    // yields the exact total n — no separate count job.
    val grouped = items
      .groupBy(when(col("tok").isin(candidates: _*), col("tok"))
        .otherwise(lit(null)).as("tok"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = grouped
      .crossJoin(broadcast(grouped.agg(sum(col("cnt")).as("n"))))
      .filter(col("tok").isNotNull && col("cnt") * k > col("n"))
      .select(col("tok"), col("cnt"), col("n"))
    // the total attaches as a broadcast scalar over ≤ c+1 grouped rows —
    // no WindowExec, no single-partition path; force the result before
    // unpersisting the shared scan
    val result = out.cache()
    result.count()
    items.unpersist(blocking = false)
    grouped.unpersist(blocking = false)
    result
  }

  /** Classic Misra–Gries over one partition's items: `c` counters; an
    * unmatched item with a full table decrements every counter (zeros
    * evicted) instead of entering. */
  private[operators] def partitionSummary(it: Iterator[String], c: Int)
      : Map[String, Long] = {
    val counters = mutable.HashMap.empty[String, Long]
    it.foreach { item =>
      counters.get(item) match {
        case Some(v) => counters.update(item, v + 1)
        case None if counters.size < c => counters.update(item, 1L)
        case None =>
          // amortized O(1): each decrement sweep pays for c prior inserts
          val dead = mutable.ArrayBuffer.empty[String]
          counters.mapValuesInPlace((_, v) => v - 1)
          counters.foreach { case (k2, v) => if (v <= 0) dead += k2 }
          dead.foreach(counters.remove)
      }
    }
    counters.toMap
  }

  /** Mergeable-summaries combine: sum matching counters; if more than
    * `c` survive, subtract the (c+1)-largest count from all and drop
    * non-positive — error bounds add, capacity stays `c`. */
  private[operators] def mergeSummaries(a: Map[String, Long],
      b: Map[String, Long], c: Int): Map[String, Long] = {
    val summed = mutable.HashMap.empty[String, Long]
    a.foreach { case (k2, v) => summed.update(k2, v) }
    b.foreach { case (k2, v) => summed.update(k2, summed.getOrElse(k2, 0L) + v) }
    if (summed.size <= c) summed.toMap
    else {
      val cut = summed.values.toArray.sorted(Ordering[Long].reverse).apply(c)
      summed.iterator.map { case (k2, v) => k2 -> (v - cut) }
        .filter(_._2 > 0).toMap
    }
  }
}
