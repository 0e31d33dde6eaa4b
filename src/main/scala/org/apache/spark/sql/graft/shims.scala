package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` helpers — the established connector pattern
  * for APIs Spark keeps semi-public (the reference's Flink connector does
  * the same for Flink internals). */
object Shims {
  /** Column → Catalyst Expression (Spark 4 removed the public `.expr`). */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Catalyst Expression → Column. */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
