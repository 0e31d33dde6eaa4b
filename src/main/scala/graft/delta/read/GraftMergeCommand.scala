package graft.delta.read

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SQL `MERGE INTO` over a Delta relation, routed to the engine's
  * [[graft.delta.write.MergeBuilder]] (one touched-file job, one rewrite
  * join, one commit). Expressions stay RESOLVED in the plan (checkAnalysis
  * walks command expressions); at run time attribute references re-anchor
  * to the builder's `t`/`s` aliases by which side their exprId came from.
  * Planted by [[graft.GraftExtensions.RouteDeltaMerges]]. The FULL
  * ordered-clause surface routes: conditional and unconditional MATCHED
  * UPDATE (SET or *) / DELETE, NOT MATCHED INSERT (explicit values or
  * * / by-name), and NOT MATCHED BY SOURCE UPDATE / DELETE. */
case class GraftMergeCommand(
    path: String,
    source: LogicalPlan,
    condition: Expression,
    matched: Seq[GraftMergeCommand.MatchedSpec],
    notMatched: Seq[GraftMergeCommand.InsertSpec],
    notMatchedBySource: Seq[GraftMergeCommand.BySourceSpec],
    targetAttrIds: Seq[ExprId],
    sourceAttrIds: Seq[ExprId])
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  private def requalified(e: Expression): Column = {
    val targetIds = targetAttrIds.toSet
    val sourceIds = sourceAttrIds.toSet
    org.apache.spark.sql.graft.Shims.column(e.transform {
      case a: AttributeReference if targetIds.contains(a.exprId) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
          Seq("t", a.name))
      case a: AttributeReference if sourceIds.contains(a.exprId) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
          Seq("s", a.name))
    })
  }

  override def run(session: SparkSession): Seq[Row] = {
    val table = graft.delta.DeltaTable.forPath(session, path)
    val sourceDF = org.apache.spark.sql.graft.Shims.ofRows(session, source)
    var builder = table.merge(sourceDF, requalified(condition))
    def setMap(set: Seq[(String, Expression)]): Map[String, Column] =
      set.map { case (n, v) => n -> requalified(v) }.toMap
    def updateAllMap: Map[String, Column] = {
      val schema = table.deltaLog.update().metadata.schema
      schema.fieldNames.map(n =>
        n -> org.apache.spark.sql.functions.col(s"s.`$n`")).toMap
    }
    matched.foreach {
      case GraftMergeCommand.MatchedSpec(cond, set, updateAll) =>
        val m = if (updateAll) updateAllMap else set.map(setMap).orNull
        (cond.map(requalified), Option(m)) match {
          case (Some(c), Some(s)) => builder = builder.whenMatchedUpdate(c, s)
          case (None, Some(s)) => builder = builder.whenMatchedUpdate(s)
          case (Some(c), None) => builder = builder.whenMatchedDelete(c)
          case (None, None) => builder = builder.whenMatchedDelete()
        }
    }
    notMatched.foreach {
      case GraftMergeCommand.InsertSpec(cond, values) =>
        (cond.map(requalified), values.map(setMap)) match {
          case (Some(c), Some(v)) => builder = builder.whenNotMatchedInsert(c, v)
          case (None, Some(v)) => builder = builder.whenNotMatchedInsert(v)
          case (Some(c), None) => builder = builder.whenNotMatchedInsertAll(c)
          case (None, None) => builder = builder.whenNotMatchedInsertAll()
        }
    }
    notMatchedBySource.foreach {
      case GraftMergeCommand.BySourceSpec(cond, set) =>
        (cond.map(requalified), set.map(setMap)) match {
          case (Some(c), Some(s)) =>
            builder = builder.whenNotMatchedBySourceUpdate(c, s)
          case (None, Some(s)) =>
            builder = builder.whenNotMatchedBySourceUpdate(s)
          case (Some(c), None) =>
            builder = builder.whenNotMatchedBySourceDelete(c)
          case (None, None) =>
            builder = builder.whenNotMatchedBySourceDelete()
        }
    }
    builder.execute()
    Seq.empty
  }
}

object GraftMergeCommand {
  /** `set = None && !updateAll` = DELETE. */
  case class MatchedSpec(cond: Option[Expression],
                         set: Option[Seq[(String, Expression)]],
                         updateAll: Boolean)
  /** `values = None` = INSERT * (align source columns by name). */
  case class InsertSpec(cond: Option[Expression],
                        values: Option[Seq[(String, Expression)]])
  case class BySourceSpec(cond: Option[Expression],
                          set: Option[Seq[(String, Expression)]])
}
