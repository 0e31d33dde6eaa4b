package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators: as-of (point-in-time) joins.
  *
  * Scale design (the 100 TB story):
  *  - the as-of join is the UNION-SORT formulation, not a range join:
  *    both sides shuffle ONCE on the equality keys, one sort per
  *    partition orders the merged timeline, and a running `last(...,
  *    ignoreNulls)` window carries the newest right row forward — no
  *    per-left-row probe, no O(left × right-per-key) intermediate like
  *    the naive `ts_r <= ts_l` theta-join Spark would otherwise BNLJ;
  *  - state per task is one key-group's merged timeline (the window
  *    frame itself is O(1): `last` over an unbounded-preceding frame is
  *    a running value, not a buffered frame);
  *  - skewed keys behave like any keyed window — salt by time range if
  *    one key dominates (split a key's timeline into chunks, carry each
  *    chunk's last right row into the next chunk's seed).
  */
object Temporal {

  /** Backward as-of join: for every left row, attach the single right row
    * with the greatest `rightTime <= leftTime` within the same `keyCols`
    * group (SQL:2023 / kdb `aj` / pandas `merge_asof` semantics; ties on
    * `rightTime` resolve to the greatest `rightTieBreak`).
    *
    * `rightPayload` columns must not collide with left column names
    * (rename on the right side first); they come back nullable — null
    * where no right row precedes the left row.
    */
  /** `tolerance` (an INTERVAL string, e.g. "10 minutes") bounds the
    * lookback: a preceding right row older than leftTime − tolerance
    * does not match (pandas merge_asof tolerance semantics) — payload
    * columns come back null, exactly like no-match. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String, rightTieBreak: String,
               rightPayload: Seq[String],
               tolerance: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one equality key")
    require(rightPayload.nonEmpty, "no right payload columns requested")
    val collisions = rightPayload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload collides with left columns: ${collisions.mkString(", ")}")

    val keyExprs = keyCols.map(col)
    // right rows sort BEFORE left rows at an equal timestamp (side 0 < 1),
    // so a right row exactly AT the left time is visible — `<=` semantics.
    // A NULL rightTime can never be "at or before" anything: drop such
    // rows up front (nulls would sort FIRST under asc and their payload
    // would fabricate a match for left rows with no genuine predecessor).
    val rightSide = right.filter(col(rightTime).isNotNull).select(
      keyExprs :+
        col(rightTime).as("__t") :+
        lit(0).as("__side") :+
        col(rightTieBreak).as("__tie") :+
        // the payload carries its own event time so a tolerance bound
        // can be applied AFTER the running-last resolves the match
        struct((rightPayload.map(col) :+ col(rightTime).as("__rt")): _*)
          .as("__payload"): _*)
    val leftSide = left.select(
      keyExprs :+
        col(leftTime).as("__t") :+
        lit(1).as("__side") :+
        lit(null).cast(rightSide.schema("__tie").dataType).as("__tie") :+
        lit(null).cast(rightSide.schema("__payload").dataType).as("__payload") :+
        struct(left.columns.map(c => col(s"`$c`")): _*).as("__row"): _*)

    val merged = rightSide
      .withColumn("__row", lit(null).cast(leftSide.schema("__row").dataType))
      .unionByName(leftSide)

    val timeline = Window.partitionBy(keyExprs: _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = merged
      .withColumn("__match", last(col("__payload"), ignoreNulls = true)
        .over(timeline))
      .filter(col("__side") === 1)

    val inRange = tolerance match {
      case None => lit(true)
      case Some(t) =>
        col("__match.__rt") >= col("__t") - expr(s"INTERVAL $t")
    }
    matched.select(
      left.columns.map(c => col(s"__row.`$c`").as(c)) ++
        rightPayload.map(c =>
          when(inRange, col(s"__match.`$c`")).otherwise(lit(null)).as(c)): _*)
  }

  /** Resample to a regular per-key grid with forward fill (last
    * observation carried forward) — the feature-pipeline staple.
    *
    * Each key gets one row per `unit` period (e.g. "day") from its first
    * to its last observation; `valueCol` carries the period's LAST
    * observation (by `tsCol`, then `tieCol`) forward across empty
    * periods. Periods before a key's first observation don't exist by
    * construction, so the fill is total.
    *
    * Scale shape: the per-period last-observation reduce is a window
    * over (key, period) — same exchange the fill pass needs, so the
    * plan pays ONE shuffle on the key; the grid explode is a pure
    * per-row `sequence` expansion (no join against a calendar table);
    * per-task state for the fill is the running last value, O(1). Grid
    * width is bounded by each key's own active span — a key observed
    * twice a year costs 365 rows/year at "day", which is the operator's
    * contract, not a surprise. */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, valueCol: String, unit: String): DataFrame = {
    val perPeriod = Window.partitionBy(col(keyCol),
        date_trunc(unit, col(tsCol)))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val lastPerPeriod = df
      .withColumn("__rn", row_number().over(perPeriod))
      .filter(col("__rn") === 1)
      .select(col(keyCol), date_trunc(unit, col(tsCol)).as("period"),
        col(valueCol).as("__obs"))
    val span = lastPerPeriod.groupBy(col(keyCol))
      .agg(min(col("period")).as("__p0"), max(col("period")).as("__p1"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("__p0"), col("__p1"),
        expr(s"INTERVAL 1 $unit"))).as("period"))
    val fill = Window.partitionBy(col(keyCol)).orderBy(col("period").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastPerPeriod, Seq(keyCol, "period"), "left")
      .withColumn(valueCol, last(col("__obs"), ignoreNulls = true).over(fill))
      .drop("__obs")
  }
}
