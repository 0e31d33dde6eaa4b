package graft.delta.write

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{lit, monotonically_increasing_id}
import org.apache.spark.sql.types.StructType

import graft.delta.{AddFile, Metadata}

/** Identity columns (the protocol's `delta.identity.*` field metadata;
  * writer-protocol-6 feature — GENERATED ALWAYS AS IDENTITY).
  *
  * Appends missing the column get machine-assigned values: unique and
  * monotonic in the step's direction, GAPS ALLOWED (the protocol's
  * contract — a dense sequence would need a global row index, i.e. an
  * extra pass over 100 TB). Assignment is `highWaterMark + (1 + rowId)
  * × step` with a per-partition row id, one codegen'd projection, no
  * shuffle. The new high-water mark comes from the values the write
  * job ACTUALLY produced (per-file stats; a distributed scan of the
  * written files is the fallback) and advances in the SAME commit's
  * metadata — so two concurrent identity appends conflict on the
  * metadata update and retry, which is what keeps values unique across
  * writers. */
object IdentityColumns {

  val StartKey = "delta.identity.start"
  val StepKey = "delta.identity.step"
  val HighWaterMarkKey = "delta.identity.highWaterMark"
  val AllowExplicitKey = "delta.identity.allowExplicitInsert"

  case class Spec(name: String, start: Long, step: Long,
                  highWaterMark: Option[Long], allowExplicit: Boolean)

  def specs(schema: StructType): Seq[Spec] = schema.fields.toSeq.collect {
    case f if f.metadata.contains(StartKey) && f.metadata.contains(StepKey) =>
      Spec(f.name,
        f.metadata.getLong(StartKey),
        f.metadata.getLong(StepKey),
        if (f.metadata.contains(HighWaterMarkKey))
          Some(f.metadata.getLong(HighWaterMarkKey)) else None,
        f.metadata.contains(AllowExplicitKey) &&
          f.metadata.getBoolean(AllowExplicitKey))
  }

  /** Assign values for identity columns the frame does not supply.
    * An ABSENT column and a NULL value both mean "assign" (SQL
    * column-list inserts arrive with the omitted column null-PADDED by
    * the analyzer — indistinguishable from an explicit null, and an
    * identity column is conceptually NOT NULL anyway). A NON-null value
    * on a GENERATED ALWAYS column aborts the write job row-wise, the
    * same failure shape as the CHECK-constraint guard. Returns the
    * frame and the names whose high-water marks must advance. */
  def assign(df: DataFrame, metadata: Metadata): (DataFrame, Seq[String]) = {
    import org.apache.spark.sql.functions.{col, concat, raise_error, when}
    val sp = specs(metadata.schema)
    if (sp.isEmpty) return (df, Nil)
    val present = df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    var out = df
    var assigned = Vector.empty[String]
    sp.foreach { s =>
      val base = s.highWaterMark.getOrElse(s.start - s.step)
      val gen = lit(base) + (monotonically_increasing_id() + 1L) * lit(s.step)
      if (!present.contains(s.name.toLowerCase(java.util.Locale.ROOT))) {
        out = out.withColumn(s.name, gen)
        assigned :+= s.name
      } else {
        val user = col(s"`${s.name}`")
        val value =
          if (s.allowExplicit) when(user.isNull, gen).otherwise(user)
          else when(user.isNull, gen).otherwise(
            raise_error(concat(
              lit(s"Column ${s.name} is GENERATED ALWAYS AS IDENTITY; " +
                "explicit values are not allowed; got "),
              user.cast("string"))).cast("long"))
        out = out.withColumn(s.name, value)
        assigned :+= s.name
      }
    }
    (out, assigned)
  }

  /** The high-water mark after this write: the extreme (in the step's
    * direction) of the values the job wrote, folded with the previous
    * mark. Reads per-file stats; scans the written files only when some
    * file's stats are missing the column. None when nothing was written. */
  def writtenWaterMark(spark: org.apache.spark.sql.SparkSession,
                       deltaLog: graft.delta.DeltaLog,
                       adds: Seq[AddFile], spec: Spec): Option[Long] = {
    if (adds.isEmpty) return spec.highWaterMark
    val key = spec.name.toLowerCase(java.util.Locale.ROOT)
    val perFile: Seq[Option[Long]] = adds.map { a =>
      a.stats.flatMap(graft.delta.read.DataSkipping.parseRaw).flatMap { p =>
        val m = if (spec.step > 0) p.maxValues else p.minValues
        m.get(key).flatMap(v => scala.util.Try(v.toLong).toOption)
      }
    }
    val written: Long =
      if (perFile.forall(_.isDefined)) {
        if (spec.step > 0) perFile.flatten.max else perFile.flatten.min
      } else {
        // stats did not cover the column (outside the indexed width):
        // one distributed pass over just the written files
        import org.apache.spark.sql.functions.{col, max, min}
        val paths = adds.map(a => graft.delta.read.PartitionUtils
          .absoluteFileName(deltaLog.dataPath, a.path))
        val agg = if (spec.step > 0) max(col(spec.name)) else min(col(spec.name))
        spark.read.parquet(paths: _*).agg(agg).head().getLong(0)
      }
    Some(spec.highWaterMark.fold(written)(old =>
      if (spec.step > 0) math.max(old, written) else math.min(old, written)))
  }
}
