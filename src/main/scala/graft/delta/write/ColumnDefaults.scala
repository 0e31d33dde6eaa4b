package graft.delta.write

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.StructType

import graft.delta.Metadata

/** Column defaults (PROTOCOL.md "Default Columns", writer feature
  * `allowColumnDefaults`; ref the supported-writer ceiling at
  * standalone/.../actions.scala:63-82 which refuses the feature — this
  * engine accepts it): a column may declare a `CURRENT_DEFAULT` SQL
  * expression in its field metadata; an INSERT/append that does not
  * provide the column materializes the default at WRITE time, so files
  * always carry physical values and the read path needs nothing.
  *
  * Per the delta-spark contract, a default affects only FUTURE writes —
  * rows written before the default existed keep whatever they had (old
  * files without the column read as null), and defaults apply on the
  * append path, not through MERGE INSERT (which requires explicit
  * values). */
object ColumnDefaults {

  /** The field-metadata key delta-spark stores the default under. */
  val MetadataKey = "CURRENT_DEFAULT"

  /** (column, default SQL expression) pairs declared in the schema. */
  def expressions(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(MetadataKey) =>
        f.name -> f.metadata.getString(MetadataKey)
    }

  def hasDefaults(schema: StructType): Boolean =
    schema.fields.exists(_.metadata.contains(MetadataKey))

  /** Materialize every defaulted column the incoming frame does not
    * carry (a provided value always wins — that is what makes it a
    * DEFAULT, not a generated column). */
  def materialize(df: DataFrame, metadata: Metadata): DataFrame = {
    val present = df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    expressions(metadata.schema).foldLeft(df) {
      case (acc, (name, defaultExpr))
          if !present.contains(name.toLowerCase(java.util.Locale.ROOT)) =>
        acc.withColumn(name,
          expr(defaultExpr).cast(metadata.schema(name).dataType))
      case (acc, _) => acc
    }
  }
}
