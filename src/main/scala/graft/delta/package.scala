package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

package object delta {
  /** Column → Catalyst Expression (Spark 4 moved `.expr` behind the
    * classic converter). */
  private[graft] def exprOf(c: Column): Expression =
    org.apache.spark.sql.graft.Shims.expression(c)
}
