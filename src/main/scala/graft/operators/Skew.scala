package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.md5Hash32

/** Skew mitigation for equi-joins whose KEY distribution is pathological
  * (one hot key owning most rows — exactly what a web-scale corpus does
  * to per-domain or per-user joins).
  *
  * AQE's skew-join handling splits oversized SHUFFLE partitions at
  * runtime, but only for sort-merge joins it can see; salting is the
  * plan-level tool when the dimension side is replicable: scatter the
  * fact side's hot key across `salts` buckets with a deterministic row
  * hash, replicate the dimension side once per bucket, and join on
  * (key, salt). One hot key then occupies `salts` tasks instead of one.
  * Output is EXACTLY the plain inner join (spec-proven), and every
  * decision is a pure hash — no RNG, identical across retries (a task
  * retry with `rand()` salting would re-scatter rows differently).
  *
  * Cost model: dimension bytes × salts extra shuffle input — use for
  * genuinely small-but-not-broadcastable dimensions or when broadcast
  * is disabled by memory pressure.
  */
object Skew {

  /** Inner equi-join of `facts` and `dim` on `key`, salted `salts` ways.
    * `scatterBy` must be a column of `facts` that distinguishes rows
    * within a key (an id); the salt is a deterministic hash of it. */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 salts: Int, scatterBy: Column): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(!facts.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "__salt column name is reserved")
    // A null scatterBy must still land in SOME bucket: md5Hash32(null) is
    // null, and a null __salt would silently drop the row from the inner
    // equi-join even when the key matches — breaking the "EXACTLY the
    // plain inner join" contract. coalesce to bucket 0.
    val saltedFacts = facts.withColumn("__salt",
      pmod(coalesce(md5Hash32(scatterBy.cast("string")), lit(0L)), lit(salts.toLong)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFacts.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
