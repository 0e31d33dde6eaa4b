package graft.delta

import com.fasterxml.jackson.databind.annotation.JsonDeserialize
import org.apache.spark.sql.types.{DataType, StructType}

/** The Delta transaction-log action model.
  *
  * Semantics follow the reference's action data model
  * (`/root/reference/standalone/src/main/scala/io/delta/standalone/internal/actions/actions.scala:47-367`)
  * and the public Delta protocol spec; the implementation is plain Scala
  * case classes so the log can be (de)serialized with Jackson for JSON
  * commits and with Spark `Encoders.product` for parquet checkpoints and
  * distributed log replay.
  */
sealed trait Action {
  def wrap: SingleAction
}

/** Marker for actions that participate in snapshot state reconstruction. */
sealed trait FileAction extends Action {
  def path: String
  def dataChange: Boolean
}

case class Format(
    provider: String = "parquet",
    options: Map[String, String] = Map.empty)

/** Table metadata — schema, partitioning, configuration.
  * Ref: actions.scala:183-214. */
case class Metadata(
    id: String = java.util.UUID.randomUUID().toString,
    name: Option[String] = None,
    description: Option[String] = None,
    format: Format = Format(),
    schemaString: Option[String] = None,
    partitionColumns: Seq[String] = Nil,
    configuration: Map[String, String] = Map.empty,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    createdTime: Option[Long] = Some(System.currentTimeMillis()))
  extends Action {

  @transient lazy val schema: StructType =
    schemaString.map(s => DataType.fromJson(s).asInstanceOf[StructType])
      .getOrElse(new StructType())

  @transient lazy val partitionSchema: StructType =
    new StructType(partitionColumns.map(c => schema(c)).toArray)

  @transient lazy val dataSchema: StructType = {
    val partitions = partitionColumns.toSet
    new StructType(schema.filterNot(f => partitions.contains(f.name)).toArray)
  }

  /** Logical column name → the PHYSICAL name stored in parquet files, for
    * columns renamed after data was written (only entries that differ).
    * See [[ColumnMapping]]. */
  @transient lazy val columnMapping: Map[String, String] =
    ColumnMapping.mapping(schema)

  /** Logical column name → parquet field id, NON-EMPTY only for foreign
    * tables in column-mapping `id` mode (where files must be resolved by
    * the parquet field-id attribute, not by name — the Iceberg-convert
    * regime, where a column's name in old footers is arbitrary). */
  @transient lazy val fieldIdMapping: Map[String, Int] =
    if (configuration.getOrElse(ColumnMapping.DeltaModeKey, "none") == "id")
      ColumnMapping.fieldIds(schema)
    else Map.empty

  def wrap: SingleAction = SingleAction(metaData = Some(this))
}

/** Rename support without rewriting data (a lightweight form of Delta's
  * `columnMapping.mode = name`): a renamed column keeps writing and reading
  * its ORIGINAL parquet name, recorded in the field metadata. The read
  * path substitutes physical names into the parquet reader's schemas —
  * positionally transparent to the engine — and the write path renames
  * DataFrame columns just before the file write. */
object ColumnMapping {
  val PhysicalNameKey = "graft.physicalName"
  /** Delta's own column-mapping field-metadata key (PROTOCOL.md "Column
    * Mapping"): honoring it makes FOREIGN reader-2 tables in `name` mode
    * readable through the same physical-name machinery our renames use. */
  val DeltaPhysicalNameKey = "delta.columnMapping.physicalName"
  val DeltaModeKey = "delta.columnMapping.mode"
  /** Physical names of DROPPED columns (comma-joined table property):
    * no later column may ever bind to them — old files still hold the
    * deleted bytes. */
  val DroppedPhysicalKey = "graft.droppedPhysicalNames"

  def droppedPhysical(configuration: Map[String, String]): Set[String] =
    configuration.get(DroppedPhysicalKey)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

  def physicalName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(PhysicalNameKey)) f.metadata.getString(PhysicalNameKey)
    else if (f.metadata.contains(DeltaPhysicalNameKey))
      f.metadata.getString(DeltaPhysicalNameKey)
    else f.name

  /** Only the columns whose physical name differs (top-level; nested
    * renames are not supported). */
  def mapping(schema: StructType): Map[String, String] =
    schema.fields.iterator
      .filter(f => physicalName(f) != f.name)
      .map(f => f.name -> physicalName(f)).toMap

  /** Delta's column-mapping field-id key (PROTOCOL.md "Column Mapping"):
    * in `id` mode every field carries a stable integer id that parquet
    * footers repeat as the field-id attribute — the resolution key that
    * survives arbitrary renames of the physical columns. */
  val DeltaFieldIdKey = "delta.columnMapping.id"

  /** Spark's parquet field-id metadata key — what `ParquetReadSupport`
    * matches file columns against (read) and
    * `SparkToParquetSchemaConverter` writes into footers (write). */
  val ParquetFieldIdKey = "parquet.field.id"

  /** Walk every StructField in the schema RECURSIVELY (through structs,
    * array elements and map keys/values), yielding its dotted logical
    * path. Array/map crossings use the synthetic segments
    * `element`/`key`/`value` — ids attach to StructFields only, so the
    * segments can never collide with a real id-bearing path unless a
    * struct names a field identically AND nests at the same spot, which
    * id-mode writers (delta-spark, Iceberg convert) never produce. */
  private def walkFields(schema: org.apache.spark.sql.types.StructType)(
      f: (String, org.apache.spark.sql.types.StructField) => Unit): Unit = {
    import org.apache.spark.sql.types.{ArrayType, MapType}
    def walk(dt: DataType, prefix: String): Unit = dt match {
      case st: StructType => st.fields.foreach { fld =>
        val p = if (prefix.isEmpty) fld.name else s"$prefix.${fld.name}"
        f(p, fld)
        walk(fld.dataType, p)
      }
      case at: ArrayType => walk(at.elementType, s"$prefix.element")
      case mt: MapType =>
        walk(mt.keyType, s"$prefix.key")
        walk(mt.valueType, s"$prefix.value")
      case _ =>
    }
    walk(schema, "")
  }

  /** Dotted logical path → field id for every (nested) field that
    * declares one. */
  def fieldIds(schema: StructType): Map[String, Int] = {
    val b = Map.newBuilder[String, Int]
    walkFields(schema) { (path, fld) =>
      if (fld.metadata.contains(DeltaFieldIdKey))
        b += path -> fld.metadata.getLong(DeltaFieldIdKey).toInt
    }
    b.result()
  }

  /** Dotted paths of (nested) fields DECLARING NO id — in `id` mode the
    * protocol requires every field to carry one, so a non-empty result
    * means corrupt/future metadata and the table must be refused rather
    * than silently resolved by name against foreign physical names. */
  def missingFieldIdPaths(schema: StructType): Seq[String] = {
    val b = Seq.newBuilder[String]
    walkFields(schema) { (path, fld) =>
      if (!fld.metadata.contains(DeltaFieldIdKey)) b += path
    }
    b.result()
  }

  /** Stamp `parquet.field.id` metadata onto the fields of `schema` named
    * by `ids` (dotted paths, recursing through structs/arrays/maps) —
    * everything else (names, types, nullability, other metadata) is
    * preserved, so the result reconciles 1:1 with the input. Used by the
    * read path (requested schemas resolve parquet columns by id) and the
    * write path (our files must carry ids foreign id-readers can bind). */
  def stampFieldIds(schema: StructType, ids: Map[String, Int]): StructType = {
    import org.apache.spark.sql.types.{ArrayType, MapType, MetadataBuilder}
    def stamp(dt: DataType, prefix: String): DataType = dt match {
      case st: StructType => StructType(st.fields.map { fld =>
        val p = if (prefix.isEmpty) fld.name else s"$prefix.${fld.name}"
        val withId = ids.get(p).fold(fld) { id =>
          fld.copy(metadata = new MetadataBuilder()
            .withMetadata(fld.metadata)
            .putLong(ParquetFieldIdKey, id.toLong).build())
        }
        withId.copy(dataType = stamp(withId.dataType, p))
      })
      case at: ArrayType => at.copy(elementType =
        stamp(at.elementType, s"$prefix.element"))
      case mt: MapType => mt.copy(
        keyType = stamp(mt.keyType, s"$prefix.key"),
        valueType = stamp(mt.valueType, s"$prefix.value"))
      case other => other
    }
    stamp(schema, "").asInstanceOf[StructType]
  }
}

/** Protocol versioning — we implement reader 1 / writer 2 like the
  * reference (actions.scala:63-82). */
case class Protocol(minReaderVersion: Int = 1, minWriterVersion: Int = 2,
                    readerFeatures: Option[Seq[String]] = None,
                    writerFeatures: Option[Seq[String]] = None)
  extends Action {
  def wrap: SingleAction = SingleAction(protocol = Some(this))
}

/** Table-features vocabulary (PROTOCOL.md "Table Features", reader 3 /
  * writer 7): a features table is readable/writable exactly when every
  * listed feature is implemented — so refusals can NAME what is missing
  * instead of hiding behind a bare version number. */
object TableFeatures {
  /** Reader features this engine implements (column mapping in both
    * modes; timestampNtz decodes natively through Spark's reader;
    * deletionVectors apply as a row-position anti-filter at scan;
    * v2Checkpoint reads uuid-named checkpoints incl. sidecars). */
  val supportedReader: Set[String] =
    Set("columnMapping", "timestampNtz", "deletionVectors", "v2Checkpoint",
      "vacuumProtocolCheck", "typeWidening", "typeWidening-preview",
      "variantType", "variantType-preview")
  /** Writer features this engine implements — the feature names of
    * legacy writer versions 2-6 plus their reader-side twins, and
    * deletionVectors (DELETE shades files, every other write path reads
    * through the shade). */
  val supportedWriter: Set[String] = Set(
    "appendOnly", "invariants", "checkConstraints", "changeDataFeed",
    "generatedColumns", "columnMapping", "identityColumns", "timestampNtz",
    "deletionVectors", "inCommitTimestamp", "v2Checkpoint",
    "domainMetadata", "clustering", "rowTracking", "vacuumProtocolCheck",
    "typeWidening", "typeWidening-preview",
    "variantType", "variantType-preview", "allowColumnDefaults",
    // capability lives in the CoordinatedLogStore seam; tables naming an
    // UNREGISTERED coordinator still read but refuse writes loudly at
    // store resolution (UnknownCoordinatorLogStore), which is a sharper
    // refusal than the blanket protocol gate
    "coordinatedCommits", "coordinatedCommits-preview",
    // honored in cleanUpExpiredLogs: the protected log prefix is cleaned
    // all-or-nothing against a boundary checkpoint
    "checkpointProtection")

  /** Writer-obligation features this engine KNOWS but deliberately does
    * not write under: UniForm (`icebergCompatV1`/`V2`) obliges a writer
    * to maintain mirrored Iceberg metadata alongside every commit. They
    * constrain WRITERS only — the data files and the Delta log stay
    * plain Delta — so tables declaring them read normally here and may
    * be VACUUMed (the features never change which files are live), while
    * write attempts refuse BY NAME rather than silently going stale on
    * the table's Iceberg mirror. `collations` and `catalogOwned-preview`
    * do NOT belong here: they change comparison and commit semantics. */
  val readToleratedWriter: Set[String] =
    Set("icebergCompatV1", "icebergCompatV2")

  /** Whether any column declares a CURRENT_DEFAULT — the condition that
    * obliges the allowColumnDefaults writer feature (delta-spark ≥3.0
    * declares it on the first DEFAULT DDL). */
  def containsColumnDefaults(schema: org.apache.spark.sql.types.StructType): Boolean =
    schema.fields.exists(
      _.metadata.contains(graft.delta.write.ColumnDefaults.MetadataKey))

  /** Whether a schema carries TIMESTAMP_NTZ anywhere — the condition
    * that obliges the timestampNtz reader+writer feature. */
  def containsTimestampNtz(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: TimestampNTZType => true
      case s: StructType => s.fields.exists(f => containsTimestampNtz(f.dataType))
      case a: ArrayType => containsTimestampNtz(a.elementType)
      case m: MapType =>
        containsTimestampNtz(m.keyType) || containsTimestampNtz(m.valueType)
      case _ => false
    }
  }

  /** Whether a schema carries a VARIANT column anywhere (the condition
    * that obliges the variantType feature on the table's protocol —
    * Spark's reader/writer handle the parquet representation natively,
    * so the feature is a declaration, not a codepath). */
  def containsVariant(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: VariantType => true
      case s: StructType => s.fields.exists(f => containsVariant(f.dataType))
      case a: ArrayType => containsVariant(a.elementType)
      case m: MapType =>
        containsVariant(m.keyType) || containsVariant(m.valueType)
      case _ => false
    }
  }

  /** The minimum LEGACY writer version a table's metadata obliges — the
    * protocol bump an enabling `SET TBLPROPERTIES` must carry (the spec's
    * property→version table; delta-spark auto-upgrades the same way). */
  def requiredLegacyWriter(metadata: Metadata): Int = {
    val cfg = metadata.configuration
    def on(c: DeltaConfig[Boolean]) = c.fromMetadata(metadata)
    Seq(
      0,
      if (on(DeltaConfigs.IS_APPEND_ONLY)) 2 else 0,
      if (cfg.keys.exists(
          _.startsWith(graft.delta.write.Invariants.ConstraintPrefix))) 3 else 0,
      if (on(DeltaConfigs.ENABLE_CHANGE_DATA_FEED)) 4 else 0,
      if (metadata.schema.fields.exists(_.metadata.contains(
          graft.delta.write.GeneratedColumns.MetadataKey))) 4 else 0,
      if (cfg.get(ColumnMapping.DeltaModeKey).exists(_ != "none")) 5 else 0,
      if (metadata.schema.fields.exists(_.metadata.contains(
          graft.delta.write.IdentityColumns.StartKey))) 6 else 0
    ).max
  }

  /** The features a LEGACY protocol version implies when upgrading to the
    * table-features form (3, 7) — the spec's version→feature mapping, so
    * an upgraded table keeps every capability its old version granted. */
  def legacyReaderFeatures(p: Protocol): Seq[String] =
    p.readerFeatures.map(_.toSeq).getOrElse(
      if (p.minReaderVersion >= 2) Seq("columnMapping") else Nil)
  def legacyWriterFeatures(p: Protocol): Seq[String] =
    p.writerFeatures.map(_.toSeq).getOrElse {
      val v = p.minWriterVersion
      Seq(
        2 -> Seq("appendOnly", "invariants"),
        3 -> Seq("checkConstraints"),
        4 -> Seq("changeDataFeed", "generatedColumns"),
        5 -> Seq("columnMapping"),
        6 -> Seq("identityColumns")
      ).collect { case (atLeast, fs) if v >= atLeast => fs }.flatten
    }

  /** The (3, 7) protocol carrying `p`'s capabilities plus `readerAdd` /
    * `writerAdd` — the auto-upgrade a feature-gated commit applies. */
  def upgradedWith(p: Protocol, readerAdd: Seq[String],
                   writerAdd: Seq[String]): Protocol =
    Protocol(3, 7,
      readerFeatures =
        Some((legacyReaderFeatures(p) ++ readerAdd).distinct.sorted),
      writerFeatures =
        Some((legacyWriterFeatures(p) ++ writerAdd).distinct.sorted))

  /** `p` plus a WRITER-only feature: the writer version jumps to 7
    * carrying the legacy-implied features; the reader side is untouched,
    * so existing readers of the table keep working. */
  def upgradedWithWriter(p: Protocol, writerAdd: Seq[String]): Protocol =
    Protocol(p.minReaderVersion, 7,
      readerFeatures = p.readerFeatures,
      writerFeatures =
        Some((legacyWriterFeatures(p) ++ writerAdd).distinct.sorted))

  /** Features the engine cannot honor; a features-version protocol that
    * LISTS NO features is unknown territory (the spec requires the list)
    * and is refused as such rather than silently admitted. */
  def unsupportedReader(p: Protocol): Seq[String] =
    p.readerFeatures.map(_.filterNot(supportedReader))
      .getOrElse(Seq("(readerFeatures unspecified)"))
  def unsupportedWriter(p: Protocol): Seq[String] =
    p.writerFeatures.map(_.filterNot(supportedWriter))
      .getOrElse(Seq("(writerFeatures unspecified)"))
}

/** Locator + integrity metadata for a file's deletion vector (PROTOCOL.md
  * "Deletion Vector Descriptor Schema"): `storageType` "i" carries the
  * Z85-inlined bitmap in `pathOrInlineDv`, "u" a relative-path UUID,
  * "p" an absolute path; `offset` is the byte position of the framed
  * bitmap inside an on-disk file; `cardinality` the number of deleted
  * rows. Resolution/IO live in [[dv.DeletionVectors]]. */
case class DeletionVectorDescriptor(
    storageType: String,
    pathOrInlineDv: String,
    @JsonDeserialize(contentAs = classOf[java.lang.Integer])
    offset: Option[Int] = None,
    sizeInBytes: Int = 0,
    cardinality: Long = 0L) {
  /** The protocol's per-descriptor identity — log replay keys file state
    * by (path, dvId): a DML that re-shades a file commits
    * `remove(path, oldDv)` + `add(path, newDv)` in ONE version, and only
    * dv-aware keying folds that to "path active with newDv" regardless of
    * the two actions' order within the commit. */
  def uniqueId: String = {
    val base = s"$storageType$pathOrInlineDv"
    offset.fold(base)(o => s"$base@$o")
  }
}

/** Pre-parsed per-file stats, written into OUR checkpoints as an extra
  * `add.stats_parsed` struct column (protocol-compatible: foreign
  * readers ignore unknown checkpoint columns; Delta's own checkpoints
  * carry the same column). Values keep their JSON-text rendering —
  * [[graft.delta.read.DataSkipping]] normalizes strings into each
  * comparison's domain anyway — and keys are lowercased once at parse
  * time. The point: at million-file scale the per-query metadata CPU is
  * dominated by re-parsing every file's stats JSON; a checkpointed
  * table skips straight past the Jackson tree walk. */
case class ParsedStats(
    numRecords: Option[Long] = None,
    minValues: Map[String, String] = Map.empty,
    maxValues: Map[String, String] = Map.empty,
    nullCount: Map[String, Long] = Map.empty)

/** A data file that is part of the table. Ref: actions.scala:109-132.
  * `stats_parsed` never serializes into commit JSON (protocol purity) —
  * it exists only in checkpoint parquet and in-memory state. */
case class AddFile(
    path: String,
    partitionValues: Map[String, String] = Map.empty,
    size: Long = 0L,
    modificationTime: Long = 0L,
    dataChange: Boolean = true,
    stats: Option[String] = None,
    tags: Option[Map[String, String]] = None,
    deletionVector: Option[DeletionVectorDescriptor] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    baseRowId: Option[Long] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    defaultRowCommitVersion: Option[Long] = None,
    @com.fasterxml.jackson.annotation.JsonIgnore
    stats_parsed: Option[ParsedStats] = None)
  extends FileAction {
  def remove(timestamp: Long = System.currentTimeMillis(),
             dataChange: Boolean = true): RemoveFile =
    RemoveFile(path, Some(timestamp), dataChange,
      extendedFileMetadata = Some(true),
      partitionValues = Some(partitionValues), size = Some(size),
      deletionVector = deletionVector,
      baseRowId = baseRowId,
      defaultRowCommitVersion = defaultRowCommitVersion)
  /** Replay/state key under dv-aware keying ("" = no deletion vector). */
  def dvId: String = deletionVector.fold("")(_.uniqueId)
  def wrap: SingleAction = SingleAction(add = Some(this))
}

/** A tombstone. Ref: actions.scala:143-157. */
case class RemoveFile(
    path: String,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    deletionTimestamp: Option[Long] = None,
    dataChange: Boolean = true,
    extendedFileMetadata: Option[Boolean] = None,
    partitionValues: Option[Map[String, String]] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    size: Option[Long] = None,
    tags: Option[Map[String, String]] = None,
    deletionVector: Option[DeletionVectorDescriptor] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    baseRowId: Option[Long] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    defaultRowCommitVersion: Option[Long] = None)
  extends FileAction {
  def delTimestamp: Long = deletionTimestamp.getOrElse(0L)
  /** Replay/state key under dv-aware keying ("" = no deletion vector). */
  def dvId: String = deletionVector.fold("")(_.uniqueId)
  def wrap: SingleAction = SingleAction(remove = Some(this))
}

/** Change-data file (never part of table state). Ref: actions.scala:164-172. */
case class AddCDCFile(
    path: String,
    partitionValues: Map[String, String] = Map.empty,
    size: Long = 0L,
    tags: Option[Map[String, String]] = None)
  extends FileAction {
  override def dataChange: Boolean = false
  def wrap: SingleAction = SingleAction(cdc = Some(this))
}

/** Streaming-writer idempotence marker. Ref: actions.scala:88-94. */
case class SetTransaction(
    appId: String,
    version: Long,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    lastUpdated: Option[Long] = None)
  extends Action {
  def wrap: SingleAction = SingleAction(txn = Some(this))
}

/** Commit provenance, recorded first in every commit we write.
  * Ref: actions.scala:235-308; operation names Operation.java:44-92. */
case class CommitInfo(
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    version: Option[Long] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    timestamp: Option[Long] = None,
    userId: Option[String] = None,
    userName: Option[String] = None,
    operation: Option[String] = None,
    operationParameters: Option[Map[String, String]] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    readVersion: Option[Long] = None,
    isolationLevel: Option[String] = None,
    isBlindAppend: Option[Boolean] = None,
    operationMetrics: Option[Map[String, String]] = None,
    userMetadata: Option[String] = None,
    engineInfo: Option[String] = None,
    /** Monotonic commit timestamp (PROTOCOL.md "In-Commit Timestamps"):
      * authoritative for timestamp queries when the table enables
      * `delta.enableInCommitTimestamps`; `timestamp` above remains the
      * writer's wall clock. */
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    inCommitTimestamp: Option[Long] = None)
  extends Action {
  def wrap: SingleAction = SingleAction(commitInfo = Some(this))
}

/** System- or user-scoped key/value state attached to the table
  * (PROTOCOL.md "Domain Metadata", writer feature domainMetadata): the
  * newest action per `domain` wins, `removed = true` drops the domain
  * from the snapshot. Carries e.g. the `delta.clustering` domain whose
  * configuration names a clustered table's clustering columns. */
case class DomainMetadata(
    domain: String,
    configuration: String = "",
    removed: Boolean = false)
  extends Action {
  def wrap: SingleAction = SingleAction(domainMetadata = Some(this))
}

/** One-of envelope matching the protocol's JSON layout: each commit-file
  * line is a SingleAction with exactly one field set.
  * Ref: actions.scala:339-367. */
case class SingleAction(
    txn: Option[SetTransaction] = None,
    add: Option[AddFile] = None,
    remove: Option[RemoveFile] = None,
    metaData: Option[Metadata] = None,
    protocol: Option[Protocol] = None,
    cdc: Option[AddCDCFile] = None,
    commitInfo: Option[CommitInfo] = None,
    domainMetadata: Option[DomainMetadata] = None) {

  def unwrap: Action =
    txn.orElse(add).orElse(remove).orElse(metaData).orElse(domainMetadata)
      .orElse(protocol).orElse(cdc).orElse(commitInfo).orNull
}

/** Operation names recorded in CommitInfo (Operation.java:44-92). */
object DeltaOperations {
  val Write = "WRITE"
  val StreamingUpdate = "STREAMING UPDATE"
  val Delete = "DELETE"
  val Truncate = "TRUNCATE"
  val Merge = "MERGE"
  val Update = "UPDATE"
  val CreateTable = "CREATE TABLE"
  val ReplaceTable = "REPLACE TABLE"
  val ManualUpdate = "Manual Update"
  val Restore = "RESTORE"
  val AddConstraint = "ADD CONSTRAINT"
  val DropConstraint = "DROP CONSTRAINT"
  val Clone = "CLONE"
  val ReplaceWhere = "REPLACE WHERE"
  val Convert = "CONVERT"
  val SetDomainMetadata = "SET DOMAIN METADATA"
  val ChangeColumn = "CHANGE COLUMN"
}
