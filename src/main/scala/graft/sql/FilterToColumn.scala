package graft.sql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources._

/** `sources.Filter` → `Column` for the DSv2 DELETE path: Spark hands the
  * catalog the WHERE clause as pushed-down filters; the engine's DML
  * layer speaks Columns. Total on the filter shapes SQL can push; a
  * `None` makes `canDeleteWhere` refuse so Spark errors loudly instead
  * of deleting the wrong rows. */
private[sql] object FilterToColumn {

  def convert(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for (lc <- convert(l); rc <- convert(r)) yield lc && rc
    case Or(l, r) => for (lc <- convert(l); rc <- convert(r)) yield lc || rc
    case Not(c) => convert(c).map(not)
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}
