package graft.delta

import org.apache.spark.sql.types._

/** Type widening (PROTOCOL.md "Type Widening", reader+writer feature
  * `typeWidening`): a column's type may grow to a wider one WITHOUT
  * rewriting data — existing parquet files keep the narrow physical type
  * and the scan upcasts them under the new read schema (Spark's
  * vectorized reader does every widening in the protocol matrix
  * natively, verified per type pair). Each change is recorded in the
  * field's `delta.typeChanges` metadata — `[{tableVersion, fromType,
  * toType}]`, the delta-spark convention — which is also what
  * authorizes the otherwise-refused type change in the write-compat
  * gate: an UNDECLARED type change in a metadata update stays an error.
  *
  * At 100 TB this is the difference between `ALTER TABLE` being a
  * metadata commit and being a full-table rewrite. */
object TypeWidening {

  val TypeChangesKey = "delta.typeChanges"
  val Feature = "typeWidening"
  /** delta-spark 3.2/3.3 wrote the preview name; same semantics. */
  val PreviewFeature = "typeWidening-preview"
  /** Sentinel `tableVersion` stamped by [[recordChange]]; the commit path
    * replaces it with the actual attempt version (a lost race must not
    * record a version where the ALTER did not happen). */
  val PendingVersion: Long = -1L

  /** The protocol's supported widenings (all verified readable through
    * Spark's parquet reader): the integer chain, float→double,
    * date→timestampNtz, integer→decimal, and decimal growth that never
    * shrinks the integer-digit capacity. */
  def allowed(from: DataType, to: DataType): Boolean = (from, to) match {
    case (f, t) if f == t => false
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (ByteType | ShortType | IntegerType, DoubleType) => true
    case (FloatType, DoubleType) => true
    case (DateType, TimestampNTZType) => true
    case (f: DecimalType, t: DecimalType) =>
      t.precision >= f.precision && t.scale >= f.scale &&
        t.precision - t.scale >= f.precision - f.scale
    case (ByteType | ShortType | IntegerType, t: DecimalType) =>
      t.precision - t.scale >= 10
    case (LongType, t: DecimalType) => t.precision - t.scale >= 20
    case _ => false
  }

  /** The schema-JSON primitive name ("integer", "long", "decimal(12,2)",
    * "timestamp_ntz" — the names `delta.typeChanges` records). */
  def typeName(dt: DataType): String =
    dt.json.stripPrefix("\"").stripSuffix("\"")

  /** `f` retyped to `to` with the change appended to its
    * `delta.typeChanges` metadata (tableVersion = [[PendingVersion]],
    * stamped with the real version at commit). */
  def recordChange(f: StructField, to: DataType): StructField = {
    val entry = new MetadataBuilder()
      .putLong("tableVersion", PendingVersion)
      .putString("fromType", typeName(f.dataType))
      .putString("toType", typeName(to))
      .build()
    val prior =
      if (f.metadata.contains(TypeChangesKey))
        f.metadata.getMetadataArray(TypeChangesKey)
      else Array.empty[Metadata0]
    f.copy(dataType = to, metadata = new MetadataBuilder()
      .withMetadata(f.metadata)
      .putMetadataArray(TypeChangesKey, prior :+ entry)
      .build())
  }
  private type Metadata0 = org.apache.spark.sql.types.Metadata

  /** Whether `nf`'s metadata DECLARES the widening from `oldT` — the
    * write-compat gate's authorization: a type change in a metadata
    * update is legal exactly when it is an allowed widening that the new
    * field records. */
  def declaredWidening(oldT: DataType, nf: StructField): Boolean =
    allowed(oldT, nf.dataType) &&
      nf.metadata.contains(TypeChangesKey) &&
      nf.metadata.getMetadataArray(TypeChangesKey).exists(e =>
        e.contains("fromType") && e.contains("toType") &&
          e.getString("fromType") == typeName(oldT) &&
          e.getString("toType") == typeName(nf.dataType))

  /** Replace [[PendingVersion]] sentinels with the commit's actual
    * attempt version (called per retry attempt from the commit path). */
  def stampPending(m: graft.delta.Metadata, version: Long): graft.delta.Metadata = {
    if (!m.schemaString.exists(_.contains("\"tableVersion\":-1"))) return m
    val stamped = StructType(m.schema.fields.map { f =>
      if (!f.metadata.contains(TypeChangesKey)) f
      else {
        val fixed = f.metadata.getMetadataArray(TypeChangesKey).map { e =>
          if (e.contains("tableVersion") &&
              e.getLong("tableVersion") == PendingVersion)
            new MetadataBuilder().withMetadata(e)
              .putLong("tableVersion", version).build()
          else e
        }
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putMetadataArray(TypeChangesKey, fixed).build())
      }
    })
    m.copy(schemaString = Some(stamped.json))
  }
}
