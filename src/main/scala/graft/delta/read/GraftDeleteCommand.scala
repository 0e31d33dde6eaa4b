package graft.delta.read

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SQL `DELETE FROM` over a Delta relation as a transactional command:
  * the WHERE clause (re-anchored to unresolved attributes so the DML
  * layer rebinds it against a fresh scan) goes straight to
  * [[graft.delta.DeltaTable.delete]], which keeps partition-only
  * predicates metadata-only and bounds rewrite deletes by partition
  * pruning + stats skipping. Planted by
  * [[graft.GraftExtensions.RouteDeltaDeletes]]. */
case class GraftDeleteCommand(
    path: String,
    condition: org.apache.spark.sql.catalyst.expressions.Expression)
  extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val unresolved = condition.transform {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(a.name)
    }
    graft.delta.DeltaTable.forPath(session, path)
      .delete(org.apache.spark.sql.graft.Shims.column(unresolved))
    Seq.empty
  }
}
