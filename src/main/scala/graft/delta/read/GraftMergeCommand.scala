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
  * Planted by [[graft.GraftExtensions.RouteDeltaMerges]], which admits the
  * builder's clause shape: unconditional MATCHED UPDATE (SET or *) xor
  * DELETE, and unconditional NOT MATCHED INSERT * / by-name. */
case class GraftMergeCommand(
    path: String,
    source: LogicalPlan,
    condition: Expression,
    updateSet: Option[Seq[(String, Expression)]],
    updateAllFromSource: Boolean,
    matchedDelete: Boolean,
    insertAll: Boolean,
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
    if (updateAllFromSource) {
      val schema = table.deltaLog.update().metadata.schema
      builder = builder.whenMatchedUpdate(schema.fieldNames.map(n =>
        n -> org.apache.spark.sql.functions.col(s"s.`$n`")).toMap)
    } else {
      updateSet.foreach(set => builder = builder.whenMatchedUpdate(
        set.map { case (n, v) => n -> requalified(v) }.toMap))
    }
    if (matchedDelete) builder = builder.whenMatchedDelete()
    if (insertAll) builder = builder.whenNotMatchedInsertAll()
    builder.execute()
    Seq.empty
  }
}
