package graft.delta

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped-aggregate MATERIALIZATION from a
  * CDF-enabled source table — the classic incremental-view-maintenance
  * shape for the self-decomposable aggregate class (count / sum): an
  * insert adds, a delete subtracts, and an update arrives as its
  * delete+insert image pair, so folding the change feed into the state
  * is one signed aggregation plus one MERGE.
  *
  * Why it matters at 100 TB: re-running `GROUP BY` over the corpus per
  * refresh is a full scan; this maintains the same answer with work
  * proportional to the CHANGE volume since the last refresh. The
  * maintained version rides the target's SetTransaction ledger, so a
  * crashed-and-retried refresh is idempotent (at-most-once fold per
  * source version range) — the exactly-once contract streaming sinks
  * already use.
  *
  * State schema: groupCols..., `n_rows` (long), `sum_<c>` per sum
  * column. Groups whose count reaches zero are DELETED from the state
  * (ordered merge clause), so the materialization never accretes dead
  * groups. */
object IncrementalAgg {

  private def appId(sourcePath: String) = s"graft-incr-agg:$sourcePath"

  /** Bring `targetPath` up to date with `sourcePath`'s latest version;
    * returns the source version now reflected. First call bootstraps
    * with one full aggregation (the only corpus-sized pass this operator
    * ever runs); later calls fold only `changes(last+1, latest)`. */
  def maintain(spark: SparkSession, sourcePath: String, targetPath: String,
               groupCols: Seq[String], sumCols: Seq[String]): Long = {
    val source = DeltaTable.forPath(spark, sourcePath)
    val sourceVersion = source.deltaLog.update().version
    val targetLog = DeltaLog.forTable(spark, targetPath)
    val id = appId(sourcePath)
    val last: Option[Long] =
      if (!targetLog.tableExists) None
      else targetLog.update().setTransactions
        .find(_.appId == id).map(_.version)

    last match {
      case Some(v0) if v0 >= sourceVersion => sourceVersion // up to date
      case None =>
        val full = source.toDF
          .groupBy(groupCols.map(col): _*)
          .agg(count(lit(1)).as("n_rows"),
            sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)
        DeltaTable.write(full, targetPath, SaveMode.Overwrite,
          idempotentTxn = Some((id, sourceVersion)))
        sourceVersion
      case Some(v0) =>
        val ch = source.changes(v0 + 1, sourceVersion)
        val sign = when(col("_change_type")
          .isin("insert", "update_postimage"), 1).otherwise(-1)
        val delta = ch.withColumn("__sign", sign)
          .groupBy(groupCols.map(col): _*)
          .agg(sum(col("__sign")).cast("long").as("d_n"),
            sumCols.map(c => sum(col(c) * col("__sign")).as(s"d_$c")): _*)
        val cond = groupCols.map(c => col(s"t.$c") <=> col(s"s.$c"))
          .reduce(_ && _)
        DeltaTable.forPath(spark, targetPath)
          .merge(delta, cond)
          .withIdempotency(id, sourceVersion)
          // ordered clauses: a group folded to zero rows leaves the state
          .whenMatchedDelete(col("t.n_rows") + col("s.d_n") === 0)
          .whenMatchedUpdate(
            Map("n_rows" -> (col("t.n_rows") + col("s.d_n"))) ++
              sumCols.map(c => s"sum_$c" ->
                (coalesce(col(s"t.sum_$c"), lit(0)) +
                  coalesce(col(s"s.d_$c"), lit(0)))).toMap)
          // insert-then-delete inside ONE range nets to d_n = 0: not a group
          .whenNotMatchedInsert(col("s.d_n") =!= 0,
            (groupCols.map(c => c -> col(s"s.$c")) ++
              Seq("n_rows" -> col("s.d_n")) ++
              sumCols.map(c => s"sum_$c" -> col(s"s.d_$c"))).toMap)
          .execute()
        sourceVersion
    }
  }
}
