package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus distribution statistics — the numbers that set a pipeline's
  * filter thresholds (length/quality cutoffs are picked off these
  * quantiles before a 100 TB filtering pass is launched).
  *
  * Quantiles are DISCRETE (type-1 / `quantile_disc`): the value at rank
  * `ceil(p * n)` of the group's sorted values. Unlike interpolated
  * quantiles there is no float blend of neighboring values — the result
  * is an actual corpus value selected by integer logic, so it is
  * bit-reproducible across engines by construction (the one `p * n`
  * multiply is the same single IEEE op everywhere).
  */
object CorpusStats {

  /** One row per group: `n` and the requested quantiles of `valueCol`
    * (columns `q_50`-style names from per-mille of p to stay legal
    * identifiers: p=0.5 → `q_500`, 0.99 → `q_990`).
    *
    * Scale shape: one shuffle by group for the sort-rank window, one
    * map-side-combinable count, a broadcast-friendly join on the group
    * key; per-group state never materializes on any single node beyond
    * the partition sort. Ties take the lowest-ranked duplicate — the
    * tie-break is (value, then arbitrary-but-irrelevant) since equal
    * values are interchangeable.
    */
  def discreteQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                        ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"quantiles must be in (0, 1]: $ps")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol).asc)
    val ranked = df.select(col(groupCol), col(valueCol))
      .withColumn("rn", row_number().over(w))
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    val withN = ranked.join(counts, Seq(groupCol))
    // keep only rows that ARE some requested quantile: rn == ceil(p*n)
    val isWanted = ps.map(p => col("rn") === ceil(lit(p) * col("n")))
      .reduce(_ || _)
    val hits = withN.filter(isWanted)
    val qCols = ps.map { p =>
      val name = s"q_${math.round(p * 1000)}"
      max(when(col("rn") === ceil(lit(p) * col("n")), col(valueCol)))
        .as(name)
    }
    hits.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"), qCols: _*)
  }
}
