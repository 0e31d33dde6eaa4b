package graft.delta.read

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

import graft.delta.Metadata
import graft.delta.write.GeneratedColumns

/** Derive PARTITION filters from data filters on generation SOURCE columns.
  *
  * The canonical 100 TB table is partitioned by `day GENERATED ALWAYS AS
  * (CAST(ts AS DATE))` — but users filter on `ts`, not `day`. Without this
  * rule such a query partition-prunes NOTHING and falls back to per-file
  * stats, which at a million files is a million stats evaluations instead
  * of a handful of partition-tuple evaluations (and on tables written
  * before stats, nothing at all). delta-spark ships the same optimization
  * (`OptimizeGeneratedColumn`); the reference's scan API has no analogue
  * because it never computes generated values (standalone only *stores*
  * `delta.generationExpression` metadata — actions.scala:183-214).
  *
  * Soundness: a derived conjunct must be IMPLIED by the data filter. For a
  * monotone non-decreasing generation f with `part = f(src)` enforced at
  * write time ([[GeneratedColumns]] materialize + equality guard):
  *
  *  - `src = L`   ⇒ `part = f(L)`          (any f, not just monotone)
  *  - `src >= L`  ⇒ `part >= f(L)`; `src > L` ⇒ `part >= f(L)` (f is not
  *    strictly monotone, so `>` weakens to `>=`)
  *  - `src <= L`  ⇒ `part <= f(L)`; `src < L` ⇒ `part <= f(L)`
  *  - `src IN (…)` ⇒ `part IN (f(…))`
  *
  * Rows with null `src` produce a null partition value; they fail the data
  * filter under 3-valued logic anyway, so the derived conjunct filtering
  * that file is sound. If `f(L)` itself evaluates to null (unparseable
  * cast), the derivation is skipped — never over-pruned.
  *
  * Recognized shapes (all monotone non-decreasing in the source):
  * `CAST(src AS DATE)`, `date(src)`, `to_date(src)`, `year(src)`,
  * `date_trunc('unit', src)`, `trunc(src, 'unit')`. Evaluation uses the
  * session timezone — the same zone [[GeneratedColumns.materialize]]
  * computed the stored values under.
  */
object GeneratedPartitionFilters {

  private val monotoneFormats =
    Set("yyyy", "yyyy-MM", "yyyy-MM-dd", "yyyy-MM-dd-HH")

  /** A recognized generation: partition column (canonical name + type),
    * source column name, and the literal mapping f. */
  private case class Shape(
      partField: StructField,
      source: String,
      f: Literal => Option[Literal])

  /** Kill switch: the derivation assumes the reader's session timezone
    * matches the zone the stored partition values were MATERIALIZED
    * under (the write-time session zone — the same contract delta-spark
    * documents). A deployment reading tables written under a different
    * zone must disable it or date-boundary predicates can over-prune. */
  val EnabledConf = "spark.graft.generatedPruning.enabled"

  /** Extra partition-filter conjuncts implied by `dataFilters`. */
  def derive(
      metadata: Metadata,
      dataFilters: Seq[Expression],
      spark: SparkSession): Seq[Expression] = {
    if (dataFilters.isEmpty || metadata.partitionColumns.isEmpty) return Nil
    if (!spark.conf.get(EnabledConf, "true").toBoolean) return Nil
    val shapes = recognizedShapes(metadata, spark)
    if (shapes.isEmpty) return Nil
    for {
      conjunct <- dataFilters.flatMap(PartitionUtils.splitConjuncts)
      s <- shapes
      derived <- deriveOne(conjunct, s)
    } yield derived
  }

  private def recognizedShapes(metadata: Metadata, spark: SparkSession): Seq[Shape] = {
    val partCols = metadata.partitionColumns.map(_.toLowerCase).toSet
    GeneratedColumns.expressions(metadata.schema)
      .filter { case (c, _) => partCols.contains(c.toLowerCase) }
      .flatMap { case (c, genExpr) =>
        val field = metadata.partitionSchema(metadata.partitionSchema.fieldIndex(c))
        parseShape(genExpr, field, metadata.schema, spark)
      }
  }

  /** The derivation's monotonicity argument lives in the SOURCE column's
    * native ordering: for Date/Timestamp sources, `CAST(src AS DATE)` etc.
    * are monotone in that ordering and the filter's literal carries the
    * same type. For a STRING source the data filter compares
    * LEXICOGRAPHICALLY (`src >= '2024-2-1'` matches '2024-10-30') while
    * the derived conjunct compares the CAST dates — two different orders,
    * so the derived filter can prune files whose rows match the data
    * filter; unparseable strings additionally generate null partitions
    * that strict pruning drops. delta-spark's OptimizeGeneratedColumn
    * gates on the resolved source type for the same reason. Only temporal
    * source types are provably order-aligned with every recognized shape. */
  private def temporalSource(schema: StructType, name: String): Boolean =
    schema.fields
      .find(_.name.equalsIgnoreCase(name))
      .exists(_.dataType match {
        case DateType | TimestampType | TimestampNTZType => true
        case _ => false
      })

  /** Parse one stored generation expression into a Shape, or None for any
    * shape we cannot prove monotone. */
  private def parseShape(
      genExpr: String,
      partField: StructField,
      schema: StructType,
      spark: SparkSession): Option[Shape] = {
    val zone = Some(spark.sessionState.conf.sessionLocalTimeZone)
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(genExpr)
      catch { case _: Exception => return None }

    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.length == 1
          && temporalSource(schema, a.nameParts.head) =>
        Some(a.nameParts.head)
      case _ => None
    }
    // Evaluate a concrete (resolved-by-construction) expression over the
    // filter literal; null / failure ⇒ no derivation.
    def evalTo(build: Literal => Expression): Literal => Option[Literal] = { lit =>
      try {
        val v = build(lit).eval(InternalRow.empty)
        if (v == null) None else Some(Literal.create(v, partField.dataType))
      } catch { case _: Exception => None }
    }
    def castDate(shapeSource: String): Shape =
      Shape(partField, shapeSource, evalTo(l => Cast(l, DateType, zone)))

    parsed match {
      case Cast(a, DateType, _, _) =>
        attrName(a).map(castDate)
      case f: UnresolvedFunction =>
        val name = f.nameParts.map(_.toLowerCase)
        (name, f.arguments) match {
          case (Seq("date") | Seq("to_date"), Seq(a)) =>
            attrName(a).map(castDate)
          case (Seq("year"), Seq(a)) =>
            attrName(a).map(n => Shape(partField, n,
              evalTo(l => Year(Cast(l, DateType, zone)))))
          case (Seq("date_trunc"), Seq(u @ Literal(_, StringType), a)) =>
            attrName(a).map(n => Shape(partField, n,
              evalTo(l => TruncTimestamp(u, Cast(l, TimestampType, zone), zone))))
          case (Seq("trunc"), Seq(a, fmt @ Literal(_, StringType))) =>
            attrName(a).map(n => Shape(partField, n,
              evalTo(l => TruncDate(Cast(l, DateType, zone), fmt))))
          // Fixed-width big-endian-component formats order lexicographically
          // the same as the underlying timestamp, so string comparisons on
          // the partition value are monotone in the source.
          case (Seq("date_format"), Seq(a, fmt @ Literal(f, StringType)))
              if monotoneFormats.contains(String.valueOf(f)) =>
            attrName(a).map(n => Shape(partField, n,
              evalTo(l => DateFormatClass(Cast(l, TimestampType, zone), fmt, zone))))
          case _ => None
        }
      case _ => None
    }
  }

  private def deriveOne(conjunct: Expression, s: Shape): Option[Expression] = {
    val part = AttributeReference(s.partField.name, s.partField.dataType,
      nullable = true)()
    def src(e: Expression): Boolean = e match {
      case a: Attribute => a.name.equalsIgnoreCase(s.source)
      case _ => false
    }
    conjunct match {
      case EqualTo(a, l: Literal) if src(a) => s.f(l).map(EqualTo(part, _))
      case EqualTo(l: Literal, a) if src(a) => s.f(l).map(EqualTo(part, _))
      case EqualNullSafe(a, l: Literal) if src(a) && l.value != null =>
        s.f(l).map(EqualTo(part, _))
      case EqualNullSafe(l: Literal, a) if src(a) && l.value != null =>
        s.f(l).map(EqualTo(part, _))
      case GreaterThan(a, l: Literal) if src(a) =>
        s.f(l).map(GreaterThanOrEqual(part, _))
      case GreaterThanOrEqual(a, l: Literal) if src(a) =>
        s.f(l).map(GreaterThanOrEqual(part, _))
      case LessThan(a, l: Literal) if src(a) =>
        s.f(l).map(LessThanOrEqual(part, _))
      case LessThanOrEqual(a, l: Literal) if src(a) =>
        s.f(l).map(LessThanOrEqual(part, _))
      // literal-first spellings flip the direction
      case GreaterThan(l: Literal, a) if src(a) =>
        s.f(l).map(LessThanOrEqual(part, _))
      case GreaterThanOrEqual(l: Literal, a) if src(a) =>
        s.f(l).map(LessThanOrEqual(part, _))
      case LessThan(l: Literal, a) if src(a) =>
        s.f(l).map(GreaterThanOrEqual(part, _))
      case LessThanOrEqual(l: Literal, a) if src(a) =>
        s.f(l).map(GreaterThanOrEqual(part, _))
      case In(a, vs) if src(a) && vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val mapped = vs.map(v => s.f(v.asInstanceOf[Literal]))
        if (mapped.forall(_.isDefined)) Some(In(part, mapped.map(_.get)))
        else None
      case _ => None
    }
  }
}
