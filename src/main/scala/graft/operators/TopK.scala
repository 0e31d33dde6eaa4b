package graft.operators

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Partial top-k per group — the aggregation formulation of
  * `ROW_NUMBER() OVER (PARTITION BY g ORDER BY ...) <= k`.
  *
  * Why it exists: the window formulation shuffles and SORTS every row of
  * every group; at 100 TB that is a full-data exchange plus a per-group
  * sort dominated by rows that can never rank. As an Aggregator the
  * operator is map-side partial: each task reduces its slice of a group
  * to at most k entries BEFORE the exchange, so the shuffle carries
  * O(k × groups × tasks) rows instead of all of them, and the merge is
  * an O(k) sorted-list union (ObjectHashAggregate keeps the typed buffer
  * off the codegen path but on the hash-agg path — no sort at all).
  *
  * Entries order by sortKey DESC, then (tie1, tie2) ASC — callers pass
  * unique tie-breakers so the result row set is deterministic.
  */
object TopK {

  type Entry = (Double, Long, Long)

  /** Buffer/result: entries sorted by the ranking order, length <= k. */
  class TopKAgg(k: Int) extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    require(k > 0, "k must be positive")
    @transient private lazy val ord =
      Ordering.by[Entry, (Double, Long, Long)](e => (-e._1, e._2, e._3))

    override def zero: Seq[Entry] = Nil

    override def reduce(b: Seq[Entry], a: Entry): Seq[Entry] =
      if (b.length >= k && ord.gteq(a, b.last)) b // cannot rank: O(1) fast path
      else ((b :+ a).sorted(ord)).take(k)

    override def merge(x: Seq[Entry], y: Seq[Entry]): Seq[Entry] =
      (x ++ y).sorted(ord).take(k)

    override def finish(r: Seq[Entry]): Seq[Entry] = r

    override def bufferEncoder = ExpressionEncoder[Seq[Entry]]()
    override def outputEncoder = ExpressionEncoder[Seq[Entry]]()
  }

  /** A column-level top-k collector: `topK(3)(price, tie1, tie2)` inside
    * any groupBy().agg(...) returns the group's k best entries as an
    * array of (sortKey, tie1, tie2) structs in rank order — posexplode
    * it for ranks. */
  def topK(k: Int): (Column, Column, Column) => Column = {
    val f = functions.udaf(new TopKAgg(k), Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaLong, Encoders.scalaLong))
    (sortKey, tie1, tie2) => f(sortKey, tie1, tie2)
  }
}
