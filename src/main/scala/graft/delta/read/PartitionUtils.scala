package graft.delta.read

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, BoundReference, Cast, Expression, Literal}
import org.apache.spark.sql.types.{DataType, NullType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.delta.AddFile

/** Partition-predicate plumbing (SURVEY §2.3 S2/S3; ref
  * util/PartitionUtils.scala:44-99, data/PartitionRowRecord.scala).
  *
  * Partition values travel through the log as strings (protocol
  * Partition-Value-Serialization); evaluation casts them to the partition
  * schema's types with Catalyst `Cast` — the same coercions the reference
  * hand-rolls in `decodePartition` (CloseableParquetDataIterator.scala:162-179).
  */
object PartitionUtils {

  /** Resolve a user-facing Column into an evaluable Catalyst expression by
    * analyzing it against an empty relation with the given schema (Spark 4
    * Columns carry unresolved ColumnNodes; evaluation requires the analyzer
    * to have bound names and picked function implementations). */
  def resolveFilter(spark: org.apache.spark.sql.SparkSession,
                    schema: StructType,
                    filter: org.apache.spark.sql.Column): Expression = {
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val resolved = empty.filter(filter).queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.getOrElse(Literal.TrueLiteral)
    // The ANALYZED (not optimized) condition keeps literal-side casts
    // unfolded — `bigintCol >= 900` resolves to `v >= cast(900 as
    // bigint)` — and DataSkipping's Attribute-vs-Literal patterns then
    // see no Literal: every DML predicate comparing an int literal to a
    // bigint/decimal column silently lost stats pruning. Fold foldable
    // subtrees the way the optimizer's ConstantFolding would (the full
    // optimizer is unusable here: it deletes trivial Filter nodes, and a
    // lost `false` filter would read back as TRUE). Eval failures keep
    // the unfolded node — pruning then just stays conservative.
    resolved.transformUp {
      case l: Literal => l
      case e if e.foldable =>
        try Literal.create(e.eval(
          org.apache.spark.sql.catalyst.InternalRow.empty), e.dataType)
        catch { case scala.util.control.NonFatal(_) => e }
    }
  }

  /** Split a predicate's conjuncts into (metadata-only, data) halves:
    * a conjunct belongs to metadata iff every reference is a partition
    * column (ref PartitionUtils.scala:61-99). */
  def splitMetadataAndDataPredicates(
      condition: Expression,
      partitionColumns: Seq[String]): (Seq[Expression], Seq[Expression]) = {
    val partCols = partitionColumns.map(_.toLowerCase).toSet
    splitConjuncts(condition).partition { e =>
      e.references.forall(a => partCols.contains(a.name.toLowerCase)) &&
        e.deterministic
    }
  }

  def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Absolute file-name string for an AddFile path (decoded `Path`
    * spelling — suitable for handing to `spark.read`). */
  def absoluteFileName(dataPath: org.apache.hadoop.fs.Path, child: String): String =
    absolutePath(dataPath, child).toString

  def absolutePath(dataPath: org.apache.hadoop.fs.Path, child: String): org.apache.hadoop.fs.Path = {
    val p = new org.apache.hadoop.fs.Path(new java.net.URI(child))
    if (p.isAbsolute) p else new org.apache.hadoop.fs.Path(dataPath, p)
  }

  /** Absolute file name in `input_file_name()`'s spelling: Spark sets the
    * input-file holder from `SparkPath.fromPath(status.getPath)`, whose
    * string form is `path.toUri.toString` (URI-encoded). `Path.toString`
    * differs for paths with spaces/non-ASCII, so comparisons against
    * `input_file_name()` MUST use this spelling on the AddFile side. */
  def inputFileName(dataPath: org.apache.hadoop.fs.Path, child: String): String =
    absolutePath(dataPath, child).toUri.toString

  /** Deserialize one partition-value string to the column's type. */
  def decodePartitionValue(raw: String, dt: DataType): Any = {
    if (raw == null) null
    else Cast(Literal(UTF8String.fromString(raw), StringType), dt,
      Some("UTC")).eval(InternalRow.empty)
  }

  /** Build the InternalRow of a file's partition values in schema order.
    * Foreign column-mapped tables (reader 2, `name` mode) key
    * partitionValues by the PHYSICAL column name (PROTOCOL.md "Column
    * Mapping") — fall back to it when the logical key is absent. */
  def partitionRow(partitionSchema: StructType,
                   values: Map[String, String]): InternalRow = {
    InternalRow.fromSeq(partitionSchema.fields.map { f =>
      val raw = values.getOrElse(f.name,
        values.getOrElse(graft.delta.ColumnMapping.physicalName(f), null))
      decodePartitionValue(raw, f.dataType)
    }.toIndexedSeq)
  }

  /** Bind a partition predicate's attribute references to ordinals in the
    * partition schema and return an evaluable expression. */
  def bind(pred: Expression, partitionSchema: StructType): Expression =
    pred.transform {
      case a: Attribute =>
        val idx = partitionSchema.fieldIndex(a.name)
        val f = partitionSchema(idx)
        BoundReference(idx, f.dataType, nullable = true)
      case l @ Literal(_, NullType) => l
    }

  /** Evaluate a (bound or unbound) partition predicate against one file's
    * partition values; SQL 3-valued logic — null ⇒ file filtered out. */
  def evalOnFile(pred: Expression, partitionSchema: StructType,
                 file: AddFile): Boolean = {
    val bound = bind(pred, partitionSchema)
    bound.eval(partitionRow(partitionSchema, file.partitionValues)) == true
  }

  /** In-memory file-list pruning with per-distinct-tuple memoization
    * (ref FilteredDeltaScanImpl.scala:46-71 — O(distinct tuples) evals
    * instead of O(files)). */
  def filterFileList(partitionSchema: StructType,
                     files: Seq[AddFile],
                     predicates: Seq[Expression]): Seq[AddFile] = {
    if (predicates.isEmpty || partitionSchema.isEmpty) return files
    val pred = predicates.reduce(And)
    val bound = bind(pred, partitionSchema)
    val cache = scala.collection.mutable.HashMap.empty[Map[String, String], Boolean]
    files.filter { f =>
      cache.getOrElseUpdate(f.partitionValues,
        bound.eval(partitionRow(partitionSchema, f.partitionValues)) == true)
    }
  }
}
