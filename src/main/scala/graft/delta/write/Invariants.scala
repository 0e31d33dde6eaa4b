package graft.delta.write

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

import graft.delta.Metadata

/** Write-time row invariants: CHECK constraints and NOT NULL columns.
  *
  * The protocol stores CHECK constraints as table properties
  * `delta.constraints.<name> = <sql predicate>` and NOT NULL as
  * `nullable = false` on the schema field (ref: PROTOCOL.md "Column
  * Invariants" / "CHECK Constraints"; the reference's writer rejects
  * violating commits — enforcement here follows the same contract:
  * a violating row fails the WRITE JOB, so the commit never happens
  * and the half-written batch directory is cleaned up).
  *
  * Enforcement is a single guard predicate evaluated inside the write
  * job itself (a `filter` whose else-branch raises): no second pass over
  * the data, no driver round-trip, codegen-friendly — the same shape as
  * Delta's `CheckDeltaInvariant` but composed from built-ins.
  */
object Invariants {

  val ConstraintPrefix = "delta.constraints."

  /** Named CHECK constraints recorded in table configuration. */
  def constraints(metadata: Metadata): Map[String, String] =
    metadata.configuration.collect {
      case (k, v) if k.startsWith(ConstraintPrefix) =>
        k.stripPrefix(ConstraintPrefix) -> v
    }

  /** Dotted paths of all non-nullable fields (nested included). */
  def notNullPaths(schema: StructType): Seq[String] = {
    def walk(s: StructType, prefix: Seq[String]): Seq[Seq[String]] =
      s.fields.toSeq.flatMap { f: StructField =>
        val here = prefix :+ f.name
        val own = if (f.nullable) Nil else Seq(here)
        f.dataType match {
          // nested NOT NULL only binds when the parent itself is present:
          // a null parent struct does not violate a child's invariant
          case inner: StructType => own ++ walk(inner, here)
          case _ => own
        }
      }
    walk(schema, Nil).map(_.map(p => s"`$p`").mkString("."))
  }

  /** Wrap `df` so every row is checked against the table's invariants
    * inside the write job; the first violating row aborts the job with
    * the constraint name and the row's values in the error message. */
  def enforce(df: DataFrame, metadata: Metadata): DataFrame = {
    val checks: Seq[(String, Column)] =
      notNullPaths(metadata.schema)
        .filter(p => hasPath(df.schema, p))
        .map { p =>
          (s"NOT NULL constraint violated for column: $p",
            // a null ancestor means "field absent", not a violation of
            // the leaf invariant (the leaf's own parent nullability is
            // checked by its own entry)
            ancestorNullOr(p, col(p).isNotNull))
        } ++
      constraints(metadata).toSeq.sortBy(_._1).map { case (name, sql) =>
        (s"CHECK constraint $name ($sql) violated",
          coalesce(expr(sql).cast("boolean"), lit(false)))
      } ++
      GeneratedColumns.expressions(metadata.schema)
        // presence matches CASE-INSENSITIVELY (a frame carrying 'DAY'
        // for generated column 'day' provided a value — the check must
        // run, not silently drop); col() resolves either spelling
        .filter { case (name, _) =>
          df.columns.exists(_.equalsIgnoreCase(name)) }
        .map { case (name, genExpr) =>
          (s"generated column $name does not match its expression ($genExpr)",
            col(s"`$name`") <=> expr(genExpr))
        }
    if (checks.isEmpty) df
    else {
      val rowJson = to_json(struct(df.columns.map(c => col(s"`$c`")).toIndexedSeq: _*))
      val guard = checks.map { case (msg, ok) =>
        when(ok, lit(true))
          .otherwise(raise_error(concat(lit(msg + " by row "), rowJson))
            .cast("boolean"))
      }.reduce(_ && _)
      df.filter(guard)
    }
  }

  private def hasPath(schema: StructType, dotted: String): Boolean = {
    val parts = dotted.split('.').map(_.stripPrefix("`").stripSuffix("`"))
    parts.foldLeft(Option[Any](schema)) {
      case (Some(s: StructType), p) =>
        s.fields.find(_.name == p).map(_.dataType)
      case _ => None
    }.isDefined
  }

  /** `parent IS NULL OR check` chain for a nested leaf. */
  private def ancestorNullOr(dotted: String, check: Column): Column = {
    val parts = dotted.split('.').toSeq
    val ancestors = (1 until parts.size).map(i => parts.take(i).mkString("."))
    ancestors.foldRight(check)((anc, acc) => col(anc).isNull || acc)
  }
}
