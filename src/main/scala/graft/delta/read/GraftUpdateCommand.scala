package graft.delta.read

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SQL `UPDATE ... SET ... [WHERE ...]` over a Delta relation as a
  * transactional command: SET expressions and the condition re-anchor to
  * unresolved attributes and go to [[graft.delta.DeltaTable.update]],
  * which rewrites only the files whose partitions/stats admit matches.
  * Planted by [[graft.GraftExtensions.RouteDeltaUpdates]]. */
case class GraftUpdateCommand(
    path: String,
    set: Seq[(String, Expression)],
    condition: Expression)
  extends LeafRunnableCommand {

  private def unresolve(e: Expression): Expression = e.transform {
    case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(a.name)
  }

  override def run(session: SparkSession): Seq[Row] = {
    graft.delta.DeltaTable.forPath(session, path).update(
      org.apache.spark.sql.graft.Shims.column(unresolve(condition)),
      set.map { case (name, value) =>
        name -> org.apache.spark.sql.graft.Shims.column(unresolve(value))
      }.toMap)
    Seq.empty
  }
}
