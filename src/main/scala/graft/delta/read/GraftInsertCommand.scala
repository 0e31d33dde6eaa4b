package graft.delta.read

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SQL `INSERT [OVERWRITE]` into a Delta relation as a transactional
  * command: executes the (already-resolved, column-aligned) source plan
  * and hands the rows to [[InsertableDeltaRelation.insert]] — one log
  * commit, never a raw file write. Planted by
  * [[graft.GraftExtensions.RouteDeltaInserts]]. */
case class GraftInsertCommand(
    relation: InsertableDeltaRelation,
    query: LogicalPlan,
    overwrite: Boolean) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(session: SparkSession): Seq[Row] = {
    relation.insert(
      org.apache.spark.sql.graft.Shims.ofRows(session, query), overwrite)
    Seq.empty
  }
}
