package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-width guard for operators whose per-row work is heavy (hashing,
  * shingling, vector math) and whose hot stage inherits the INPUT
  * partitioning — projections, broadcast joins and generators add no
  * shuffle, so a narrow input (one small parquet file ⇒ one scan
  * partition) would run the whole stage in one task.
  *
  * `widen` repartitions only when the input arrives narrower than the
  * cluster has slots: a 100 TB corpus already comes in thousands of
  * partitions and passes through untouched — no shuffle is ever added at
  * scale. The round-robin repartition is correctness-neutral for every
  * caller here (their semantics are row-independent up to the first
  * keyed shuffle).
  */
private[operators] object InputWidth {
  def widen(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // probe width via the cached internal-row RDD — df.rdd would stack a
    // whole row-deserializer conversion on top just to read a partition
    // count. (The executed plan's outputPartitioning is NOT usable here:
    // file scans report UnknownPartitioning(0), which would force a
    // shuffle on every already-wide input.)
    val width = df.queryExecution.toRdd.getNumPartitions
    if (width < parallelism) df.repartition(parallelism)
    else df
  }
}
