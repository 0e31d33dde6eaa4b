package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

/** SQL surface for the table-maintenance operators (the SQL face of
  * [[graft.delta.DeltaTable.compact]] and `vacuum` — Delta Lake exposes
  * the same statements, and a user of the reference who runs OPTIMIZE /
  * VACUUM from SQL should not need the Scala API):
  *
  * {{{
  * OPTIMIZE '/path/to/table'
  * OPTIMIZE graft.db.tbl ZORDER BY (c1, c2)
  * VACUUM '/path/to/table'
  * VACUUM graft.db.tbl RETAIN 168 HOURS
  * }}}
  *
  * Implemented as a delegating parser (the standard extension-grammar
  * pattern): two statement shapes are recognized up front, everything
  * else — including every other parser entry point — goes to Spark's
  * parser untouched.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  private def parseGraft(sqlText: String): Option[LogicalPlan] = sqlText match {
    // before OPTIMIZE: "OPTIMIZE LOG t" must not parse as table `LOG`
    case OptimizeLogRe(target, start, end) =>
      Some(GraftOptimizeLogCommand(parseTarget(target),
        Option(start).map(s => (s.toLong, end.toLong))))
    case OptimizeRe(target, full, where, zorder) =>
      // FULL (delta-spark syntax) forces a whole-table re-cluster of a
      // liquid-clustered table; meaningless with an explicit ZORDER BY
      if (full != null && zorder != null) {
        throw new IllegalArgumentException(
          "OPTIMIZE ... FULL cannot combine with ZORDER BY " +
            "(ZORDER BY always rewrites every candidate)")
      }
      Some(GraftOptimizeCommand(parseTarget(target),
        Option(zorder).toSeq.flatMap(_.split(",").map(cleanIdent)),
        Option(where).map(_.trim), full = full != null))
    case VacuumRe(target, mode, hours, dryRun) =>
      Some(GraftVacuumCommand(parseTarget(target),
        Option(hours).map(_.toDouble), dryRun != null,
        lite = Option(mode).exists(_.equalsIgnoreCase("LITE"))))
    case ReorgRe(target, where) =>
      Some(GraftReorgCommand(parseTarget(target), Option(where).map(_.trim)))
    case GenerateRe(mode, target) =>
      Some(GraftGenerateCommand(parseTarget(target), mode))
    case RestoreRe(target, version) =>
      Some(GraftRestoreCommand(parseTarget(target), version.toLong))
    case RestoreTsRe(target, ts) =>
      Some(GraftRestoreTimestampCommand(parseTarget(target), ts))
    case CloneRe(target, mode, source, version, ts) =>
      Some(GraftCloneCommand(parseTarget(target), parseTarget(source),
        Option(version).map(_.toLong), Option(ts),
        deep = mode.equalsIgnoreCase("DEEP")))
    case ConvertRe(target, partCols) =>
      Some(GraftConvertCommand(parseTarget(target),
        Option(partCols).toSeq.flatMap(_.split(",").map(s =>
          cleanIdent(s.trim.split("\\s+")(0))))))
    case ClusterByRe(target, cols, none)
        // intercept ONLY path literals (Spark's grammar cannot name a
        // bare path): named tables take Spark's NATIVE ALTER TABLE ...
        // CLUSTER BY plan, which routes per-catalog — so a second
        // registered catalog keeps its own clustering DDL (the graft
        // catalog handles the TableChange.ClusterBy in alterTable)
        if target.startsWith("'") || target.startsWith("\"") =>
      Some(GraftClusterByCommand(parseTarget(target),
        if (none != null) Nil
        else cols.split(",").map(cleanIdent).map(_.trim).toSeq))
    case AddConstraintRe(target, name, expr) =>
      Some(GraftAddConstraintCommand(parseTarget(target), name, expr.trim))
    case DropConstraintRe(target, ifExists, name) =>
      Some(GraftDropConstraintCommand(parseTarget(target), name,
        ifExists != null))
    case DropFeatureRe(target, name, truncate) =>
      Some(GraftDropFeatureCommand(parseTarget(target), name,
        truncate != null))
    case CopyIntoRe(target, source, fmt, pat, fmtOpts, copyOpts) =>
      val fo = Option(fmtOpts).filter(_.trim.nonEmpty)
        .map(s => GraftSqlParser.parsePropPairs(s).getOrElse(
          throw new IllegalArgumentException(
            s"Unparseable FORMAT_OPTIONS: $s")))
        .getOrElse(Map.empty[String, String])
      val co = Option(copyOpts).filter(_.trim.nonEmpty)
        .map(s => GraftSqlParser.parsePropPairs(s).getOrElse(
          throw new IllegalArgumentException(
            s"Unparseable COPY_OPTIONS: $s")))
        .getOrElse(Map.empty[String, String])
      co.keys.find(k => !k.equalsIgnoreCase("force")).foreach { k =>
        throw new IllegalArgumentException(s"Unknown COPY_OPTIONS key: $k")
      }
      Some(GraftCopyIntoCommand(parseTarget(target), source, fmt,
        Option(pat), fo,
        force = co.exists { case (k, v) =>
          k.equalsIgnoreCase("force") && v.toBoolean }))
    case FsckRe(target, dryRun) =>
      Some(GraftFsckCommand(parseTarget(target), dryRun != null))
    case DescribeHistoryRe(target, limit) =>
      Some(GraftDescribeHistoryCommand(parseTarget(target),
        Option(limit).map(_.toInt)))
    case DescribeDetailRe(target) =>
      // IO deferred to run() (the GraftDescribeHistoryCommand pattern) so
      // parse-only paths — EXPLAIN, dry parsing — never touch storage
      Some(GraftDescribeDetailCommand(parseTarget(target)))
    case SetPropsRe(target, pairs) =>
      GraftSqlParser.parsePropPairs(pairs).map(props =>
        GraftSetPropertiesCommand(parseTarget(target), props))
    case UnsetPropsRe(target, keys) =>
      GraftSqlParser.parsePropKeys(keys).map(ks =>
        GraftUnsetPropertiesCommand(parseTarget(target), ks))
    case ShowPropsRe(target, k1, k2, k3) =>
      // read face of SET/UNSET TBLPROPERTIES; IO deferred to run()
      Some(GraftShowPropertiesCommand(parseTarget(target),
        Seq(k1, k2, k3).find(_ != null)))
    case _ => None
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    parseGraft(sqlText).getOrElse(delegate.parsePlan(sqlText))

  /** A quoted literal is a path; anything else is a (possibly
    * multi-part, possibly backquoted) catalog identifier. */
  private def parseTarget(target: String): Either[String, Seq[String]] = {
    val t = target.trim
    if ((t.startsWith("'") && t.endsWith("'")) ||
        (t.startsWith("\"") && t.endsWith("\""))) {
      Left(t.substring(1, t.length - 1))
    } else Right(delegate.parseMultipartIdentifier(t))
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  /** Spark 4's `spark.sql(...)` enters here (parameterized-query path) —
    * the extension statements carry no parameter markers, so they parse
    * the same way on both entry points. */
  override def parsePlanWithParameters(
      sqlText: String, ctx: ParameterContext): LogicalPlan =
    parseGraft(sqlText)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))
}

object GraftSqlParser {

  private val OptimizeLogRe =
    """(?is)\s*OPTIMIZE\s+LOG\s+((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)(?:\s+BETWEEN\s+(\d+)\s+AND\s+(\d+))?\s*;?\s*""".r
  private val OptimizeRe =
    """(?is)\s*OPTIMIZE\s+((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)(?:\s+(FULL))?(?:\s+WHERE\s+(.+?))?(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*""".r
  private val VacuumRe =
    """(?is)\s*VACUUM\s+((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)(?:\s+(LITE|FULL))?(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?(?:\s+(DRY\s+RUN))?\s*;?\s*""".r
  private val ReorgRe =
    """(?is)\s*REORG\s+TABLE\s+((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)(?:\s+WHERE\s+(.+?))?\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*""".r
  private val GenerateRe =
    """(?is)\s*GENERATE\s+'?(\w+)'?\s+FOR\s+TABLE\s+((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)\s*;?\s*""".r
  private val RestoreTsRe =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r
  private val RestoreRe =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val ConvertRe =
    """(?is)\s*CONVERT\s+TO\s+DELTA\s+((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?\s*;?\s*""".r
  private val CloneRe =
    """(?is)\s*CREATE\s+TABLE\s+((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)\s+(SHALLOW|DEEP)\s+CLONE\s+((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)(?:\s+VERSION\s+AS\s+OF\s+(\d+)|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?\s*;?\s*""".r
  private val ClusterByRe =
    """(?is)\s*ALTER\s+TABLE\s+((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)\s+CLUSTER\s+BY\s*(?:\(([^)]+)\)|(NONE))\s*;?\s*""".r
  private val AddConstraintRe =
    """(?is)\s*ALTER\s+TABLE\s+((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val DropConstraintRe =
    """(?is)\s*ALTER\s+TABLE\s+((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)\s+DROP\s+CONSTRAINT\s+(IF\s+EXISTS\s+)?(\w+)\s*;?\s*""".r
  private val FsckRe =
    """(?is)\s*FSCK\s+REPAIR\s+TABLE\s+((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)(?:\s+(DRY\s+RUN))?\s*;?\s*""".r
  private val DescribeHistoryRe =
    """(?is)\s*DESC(?:RIBE)?\s+HISTORY\s+((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)(?:\s+LIMIT\s+(\d+))?\s*;?\s*""".r
  private val DescribeDetailRe =
    """(?is)\s*DESC(?:RIBE)?\s+DETAIL\s+((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)\s*;?\s*""".r
  private val DropFeatureRe =
    """(?is)\s*ALTER\s+TABLE\s+((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)\s+DROP\s+FEATURE\s+([\w-]+)(?:\s+(TRUNCATE\s+HISTORY))?\s*;?\s*""".r
  private val CopyIntoRe =
    """(?is)\s*COPY\s+INTO\s+((?:'[^']*')|(?:"[^"]*")|(?:`[^`]*`|[\w.])+)\s+FROM\s+'([^']+)'\s+FILEFORMAT\s*=\s*(\w+)(?:\s+PATTERN\s*=\s*'([^']+)')?(?:\s+FORMAT_OPTIONS\s*\(([^)]*)\))?(?:\s+COPY_OPTIONS\s*\(([^)]*)\))?\s*;?\s*""".r
  // PATH targets only — identifier targets delegate to the catalog's
  // native ALTER TABLE handling
  private val SetPropsRe =
    """(?is)\s*ALTER\s+TABLE\s+('[^']*'|"[^"]*")\s+SET\s+TBLPROPERTIES\s*\((.+)\)\s*;?\s*""".r
  private val UnsetPropsRe =
    """(?is)\s*ALTER\s+TABLE\s+('[^']*'|"[^"]*")\s+UNSET\s+TBLPROPERTIES\s*(?:IF\s+EXISTS\s*)?\((.+)\)\s*;?\s*""".r
  private val ShowPropsRe =
    """(?is)\s*SHOW\s+TBLPROPERTIES\s+('[^']*'|"[^"]*")(?:\s*\(\s*(?:'([^']+)'|"([^"]+)"|([\w.\-]+))\s*\))?\s*;?\s*""".r
  private val PropPairRe =
    """\s*(?:'([^']+)'|"([^"]+)"|([\w.\-]+))\s*=\s*(?:'([^']*)'|"([^"]*)"|([^,\s]+))\s*""".r
  private val PropKeyRe =
    """\s*(?:'([^']+)'|"([^"]+)"|([\w.\-]+))\s*""".r

  /** `'k'='v', k2 = "v2", …` → ordered map; None when nothing parses
    * (the statement then falls through to the delegate's own error). */
  private[sql] def parsePropPairs(s: String): Option[Map[String, String]] = {
    val pairs = PropPairRe.findAllMatchIn(s).map { m =>
      val k = Seq(m.group(1), m.group(2), m.group(3)).find(_ != null).get
      val v = Seq(m.group(4), m.group(5), m.group(6)).find(_ != null).get
      k -> v
    }.toSeq
    // every TOP-LEVEL `=` must belong to a parsed pair — a half-parsed
    // property list must not silently drop entries. `=` inside quoted
    // values ('url'='http://h?x=1') is value text, not a separator.
    var topEq = 0
    var quote: Char = 0
    s.foreach { c =>
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') quote = c
      else if (c == '=') topEq += 1
    }
    // duplicate keys must not silently last-write-win (Spark's own
    // property-list grammar rejects them with "Found duplicate keys")
    val dup = pairs.groupBy(_._1).collectFirst { case (k, vs) if vs.size > 1 => k }
    dup.foreach(k => throw new IllegalArgumentException(
      s"Found duplicate key in TBLPROPERTIES: $k"))
    if (pairs.nonEmpty && pairs.size == topEq) Some(pairs.toMap)
    else None
  }

  private[sql] def parsePropKeys(s: String): Option[Seq[String]] = {
    val keys = s.split(",").toSeq.map(_.trim).map {
      case PropKeyRe(q1, q2, bare) => Seq(q1, q2, bare).find(_ != null)
      case _ => None
    }
    if (keys.nonEmpty && keys.forall(_.isDefined)) Some(keys.map(_.get))
    else None
  }

  private def cleanIdent(s: String): String =
    s.trim.stripPrefix("`").stripSuffix("`")

  private[sql] def resolveCatalogIdent(spark: SparkSession,
      parts: Seq[String]): (org.apache.spark.sql.connector.catalog.CatalogPlugin,
      Identifier) = {
    val cm = spark.sessionState.catalogManager
    parts match {
      case Seq(tbl) =>
        (cm.currentCatalog, Identifier.of(cm.currentNamespace, tbl))
      case head +: rest if cm.isCatalogRegistered(head) =>
        (cm.catalog(head), Identifier.of(rest.init.toArray, rest.last))
      case _ =>
        (cm.currentCatalog, Identifier.of(parts.init.toArray, parts.last))
    }
  }

  /** Resolve a target to the path a NEW table would occupy: quoted paths
    * pass through; identifiers map into a [[GraftCatalog]]'s warehouse
    * layout (where the directory IS the metastore entry). */
  private[sql] def resolveNewTablePath(spark: SparkSession,
                                       target: Either[String, Seq[String]]): String =
    target match {
      case Left(path) => path
      case Right(parts) =>
        val (catalog, ident) = resolveCatalogIdent(spark, parts)
        catalog match {
          case g: GraftCatalog => g.tablePath(ident).toString
          case other => throw new UnsupportedOperationException(
            s"Catalog ${other.name()} cannot place new graft tables")
        }
    }

  /** Resolve a statement target to a table path: quoted paths pass
    * through; identifiers load through the (current or named) catalog and
    * must land on a [[GraftTable]]. */
  private[sql] def resolvePath(spark: SparkSession,
                               target: Either[String, Seq[String]]): String =
    target match {
      case Left(path) => path
      case Right(parts) =>
        val (catalog, ident) = resolveCatalogIdent(spark, parts)
        catalog match {
          case tc: TableCatalog => tc.loadTable(ident) match {
            case g: GraftTable => g.path
            case other => throw new UnsupportedOperationException(
              s"${parts.mkString(".")} is not a graft table " +
                s"(got ${other.getClass.getSimpleName})")
          }
          case other => throw new UnsupportedOperationException(
            s"Catalog ${other.name()} does not support tables")
        }
    }
}

/** `OPTIMIZE <table> [WHERE <partition predicate>] [ZORDER BY (cols)]`
  * → [[graft.delta.DeltaTable.compact]]. WHERE bounds the compaction to
  * matching partitions — the incremental-maintenance shape for tables
  * too large to OPTIMIZE whole. */
case class GraftOptimizeCommand(
    target: Either[String, Seq[String]],
    zOrderBy: Seq[String],
    where: Option[String] = None,
    full: Boolean = false) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(session, target)
    val table = graft.delta.DeltaTable.forPath(session, path)
    val whereCol = where.map(w => org.apache.spark.sql.functions.expr(w))
    // Z-order is one whole-candidate clustering pass; plain compaction
    // loops until a pass compacts nothing, so the STATEMENT means "the
    // table is optimized" even past the per-commit incremental bound
    val before = table.version
    var version = table.compact(zOrderBy = zOrderBy, where = whereCol,
      fullReCluster = full)
    // a first pass that committed nothing IS the fixpoint — skip the
    // confirmation passes entirely
    if (zOrderBy.isEmpty && version != before) {
      var prev = -1L
      var rounds = 0
      while (version != prev && rounds < 1000) {
        prev = version
        version = table.compact(where = whereCol)
        rounds += 1
      }
    }
    Seq(Row(path, version))
  }
}

/** `OPTIMIZE LOG <table> [BETWEEN <start> AND <end>]` →
  * [[graft.delta.DeltaLog.compactLog]]: write the minor-compaction file
  * `{start}.{end}.compacted.json` reconciling the range, so tail replay
  * between checkpoints reads one file instead of N commits (PROTOCOL.md
  * "Log Compaction Files"). Without BETWEEN, the range defaults to the
  * whole post-checkpoint tail — the slice replay actually walks. The
  * automatic cadence (`graft.logCompaction.interval`) covers steady
  * writers; this statement serves tables that accumulated a long tail
  * with the cadence off. No-op (start = end = -1 in the output) when the
  * default range has fewer than two commits. */
case class GraftOptimizeLogCommand(
    target: Either[String, Seq[String]],
    range: Option[(Long, Long)]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("startVersion", LongType, nullable = false)(),
    AttributeReference("endVersion", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(session, target)
    val log = graft.delta.DeltaLog.forTable(session, path)
    val snap = log.update()
    val (start, end) = range.getOrElse {
      (snap.logSegment.checkpointVersion.map(_ + 1L).getOrElse(0L),
        snap.version)
    }
    if (range.isEmpty && end <= start) {
      // a tail of fewer than two commits has nothing to compact
      Seq(Row(path, -1L, -1L))
    } else {
      require(end <= snap.version,
        s"OPTIMIZE LOG range end $end is beyond the latest version " +
          s"${snap.version}")
      log.compactLog(start, end)
      Seq(Row(path, start, end))
    }
  }
}

/** `RESTORE [TABLE] <table> TO VERSION AS OF n` →
  * [[graft.delta.DeltaTable.restore]]. */
/** `REORG TABLE <tbl> [WHERE <part predicate>] APPLY (PURGE)` →
  * [[graft.delta.DeltaTable.compact]] in purge-only mode: rewrite
  * exactly the files carrying deletion vectors (materializing the
  * surviving rows), leaving well-sized unshaded files alone. */
case class GraftReorgCommand(
    target: Either[String, Seq[String]],
    where: Option[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("committed_version", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(session, target)
    val v = graft.delta.DeltaTable.forPath(session, path)
      .compact(where = where.map(org.apache.spark.sql.functions.expr),
        purgeOnly = true)
    Seq(Row(path, v))
  }
}

/** `GENERATE symlink_format_manifest FOR TABLE <tbl>` →
  * [[graft.delta.SymlinkManifest.generate]]. Unknown modes refuse by
  * name (delta-spark's contract). */
case class GraftGenerateCommand(
    target: Either[String, Seq[String]],
    mode: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("manifests_written", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    require(mode.equalsIgnoreCase("symlink_format_manifest"),
      s"Unknown GENERATE mode '$mode'; supported: symlink_format_manifest")
    val path = GraftSqlParser.resolvePath(session, target)
    val n = graft.delta.DeltaTable.forPath(session, path)
      .generateSymlinkManifest()
    Seq(Row(path, n))
  }
}

case class GraftRestoreCommand(
    target: Either[String, Seq[String]],
    version: Long) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("restored_version", LongType, nullable = false)(),
    AttributeReference("committed_version", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(session, target)
    val committed = graft.delta.DeltaTable.forPath(session, path)
      .restore(version)
    Seq(Row(path, version, committed))
  }
}

/** `CONVERT TO DELTA '<path>' [PARTITIONED BY (c1, c2 type)]` →
  * [[graft.delta.DeltaTable.convertToDelta]]. Partition types, if
  * written, are ignored — the reader's inferred types are stored. */
case class GraftConvertCommand(
    target: Either[String, Seq[String]],
    partitionColumns: Seq[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("num_converted_files", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    // a convert target is not a delta table yet — identifiers resolve to
    // the warehouse location, not through loadTable
    val path = GraftSqlParser.resolveNewTablePath(session, target)
    graft.delta.DeltaTable.convertToDelta(session, path, partitionColumns)
    val n = graft.delta.DeltaTable.forPath(session, path)
      .deltaLog.update().numOfFiles
    Seq(Row(path, n))
  }
}

/** `CREATE TABLE <target> SHALLOW CLONE <source>
  * [VERSION AS OF n | TIMESTAMP AS OF 'ts']` →
  * [[graft.delta.DeltaTable.cloneTo]]. The target is a path ('/p/t') or
  * an identifier resolving through the catalog; zero data files copy;
  * the time-travel forms pin a historical source snapshot. */
case class GraftCloneCommand(
    target: Either[String, Seq[String]],
    source: Either[String, Seq[String]],
    versionAsOf: Option[Long] = None,
    timestampAsOf: Option[String] = None,
    deep: Boolean = false) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("target", StringType, nullable = false)(),
    AttributeReference("num_copied_files", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val srcPath = GraftSqlParser.resolvePath(session, source)
    // the target table does not exist yet: identifiers resolve to the
    // warehouse location a new table would occupy
    val dstPath = GraftSqlParser.resolveNewTablePath(session, target)
    val src = graft.delta.DeltaTable.forPath(session, srcPath)
    val tsMillis = timestampAsOf.map(t =>
      graft.delta.TimestampParsing.parseMillis(session, t))
    if (deep) src.deepCloneTo(dstPath, versionAsOf, tsMillis)
    else src.cloneTo(dstPath, versionAsOf, tsMillis)
    val n = graft.delta.DeltaTable.forPath(session, dstPath)
      .deltaLog.update().numOfFiles
    Seq(Row(dstPath, n))
  }
}

/** `ALTER TABLE <tbl> ADD CONSTRAINT <name> CHECK (<expr>)` →
  * [[graft.delta.DeltaTable.addConstraint]]. Spark's own grammar has no
  * CHECK constraints; Delta Lake adds this exact statement shape. */
case class GraftAddConstraintCommand(
    target: Either[String, Seq[String]],
    name: String,
    expr: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(session, target)
    graft.delta.DeltaTable.forPath(session, path).addConstraint(name, expr)
    Nil
  }
}

/** `ALTER TABLE <tbl> CLUSTER BY (cols)` / `CLUSTER BY NONE` →
  * [[graft.delta.DeltaTable.setClusteringColumns]] (the delta-spark
  * liquid-clustering DDL): OPTIMIZE then re-clusters incrementally by
  * the declared columns; NONE reverts OPTIMIZE to plain bin-packing. */
case class GraftClusterByCommand(
    target: Either[String, Seq[String]],
    columns: Seq[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(session, target)
    graft.delta.DeltaTable.forPath(session, path)
      .setClusteringColumns(columns)
    Nil
  }
}

/** `ALTER TABLE <tbl> DROP CONSTRAINT [IF EXISTS] <name>` →
  * [[graft.delta.DeltaTable.dropConstraint]]. */
case class GraftDropConstraintCommand(
    target: Either[String, Seq[String]],
    name: String,
    ifExists: Boolean) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(session, target)
    graft.delta.DeltaTable.forPath(session, path)
      .dropConstraint(name, ifExists)
    Nil
  }
}

/** `ALTER TABLE <tbl> DROP FEATURE <name> [TRUNCATE HISTORY]` →
  * [[graft.delta.DeltaTable.dropFeature]] (protocol downgrade with
  * trace validation; TRUNCATE HISTORY deletes the pre-downgrade log
  * prefix against the boundary checkpoint). */
case class GraftDropFeatureCommand(
    target: Either[String, Seq[String]],
    name: String,
    truncateHistory: Boolean) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(session, target)
    graft.delta.DeltaTable.forPath(session, path)
      .dropFeature(name, truncateHistory)
    Nil
  }
}

/** `ALTER TABLE '<path>' SET TBLPROPERTIES (…)` →
  * [[graft.delta.DeltaTable.setProperties]] (path targets only —
  * identifier targets take the catalog's native route). */
case class GraftSetPropertiesCommand(
    target: Either[String, Seq[String]],
    props: Map[String, String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(session, target)
    graft.delta.DeltaTable.forPath(session, path).setProperties(props)
    Nil
  }
}

/** `ALTER TABLE '<path>' UNSET TBLPROPERTIES (…)` →
  * [[graft.delta.DeltaTable.unsetProperties]]. */
case class GraftUnsetPropertiesCommand(
    target: Either[String, Seq[String]],
    keys: Seq[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(session, target)
    graft.delta.DeltaTable.forPath(session, path).unsetProperties(keys)
    Nil
  }
}

/** `RESTORE [TABLE] <table> TO TIMESTAMP AS OF 'ts'` →
  * [[graft.delta.DeltaTable.restoreToTimestamp]]. */
case class GraftRestoreTimestampCommand(
    target: Either[String, Seq[String]],
    timestamp: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("committed_version", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(session, target)
    val committed = graft.delta.DeltaTable.forPath(session, path)
      .restoreToTimestamp(graft.delta.TimestampParsing.parseMillis(session, timestamp))
    Seq(Row(path, committed))
  }
}

/** `VACUUM <table> [LITE|FULL] [RETAIN n HOURS] [DRY RUN]` →
  * [[graft.delta.DeltaTable.vacuum]]. DRY RUN reports the would-be
  * deletion count without touching any file; LITE derives candidates
  * from the log instead of listing the table. */
/** `COPY INTO <table> FROM '<dir>' FILEFORMAT = <fmt> [PATTERN = '<glob>']
  * [FORMAT_OPTIONS(...)] [COPY_OPTIONS('force'='true')]` →
  * [[graft.delta.write.CopyInto.run]]: idempotent bulk file ingestion —
  * re-running the statement never double-loads a file. */
case class GraftCopyIntoCommand(
    target: Either[String, Seq[String]],
    source: String,
    fileFormat: String,
    pattern: Option[String],
    formatOptions: Map[String, String],
    force: Boolean) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_loaded_files", LongType, nullable = false)(),
    AttributeReference("num_loaded_rows", LongType, nullable = false)(),
    AttributeReference("num_skipped_files", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(session, target)
    val r = graft.delta.write.CopyInto.run(session, path, source,
      fileFormat, pattern, force, formatOptions)
    Seq(Row(r.version, r.filesLoaded, r.rowsLoaded, r.filesSkipped))
  }
}

/** `FSCK REPAIR TABLE <tbl> [DRY RUN]` →
  * [[graft.delta.DeltaTable.fsckRepair]]: drop entries whose physical
  * file vanished out-of-band; DRY RUN reports without committing. */
case class GraftFsckCommand(
    target: Either[String, Seq[String]],
    dryRun: Boolean) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("missing_files", LongType, nullable = false)(),
    AttributeReference("dry_run", org.apache.spark.sql.types.BooleanType,
      nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(session, target)
    val n = graft.delta.DeltaTable.forPath(session, path).fsckRepair(dryRun)
    Seq(Row(path, n, dryRun))
  }
}

/** `DESCRIBE HISTORY <tbl> [LIMIT n]` — delta-spark's commit-log view
  * (M12), newest first, the full CommitInfo surface including the
  * operationParameters / operationMetrics maps (the `graft_history` TVF
  * keeps its narrower columnar shape for SQL joins). */
case class GraftDescribeHistoryCommand(
    target: Either[String, Seq[String]],
    limit: Option[Int]) extends LeafRunnableCommand {

  import org.apache.spark.sql.types.{BooleanType, MapType, TimestampType}

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("timestamp", TimestampType)(),
    AttributeReference("userId", StringType)(),
    AttributeReference("userName", StringType)(),
    AttributeReference("operation", StringType)(),
    AttributeReference("operationParameters",
      MapType(StringType, StringType))(),
    AttributeReference("readVersion", LongType)(),
    AttributeReference("isolationLevel", StringType)(),
    AttributeReference("isBlindAppend", BooleanType)(),
    AttributeReference("operationMetrics",
      MapType(StringType, StringType))(),
    AttributeReference("userMetadata", StringType)(),
    AttributeReference("engineInfo", StringType)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(session, target)
    val hist = graft.delta.DeltaLog.forTable(session, path).history()
    limit.fold(hist)(hist.take).map { ci =>
      Row(
        ci.version.map(Long.box).orNull,
        ci.timestamp.map(t => new java.sql.Timestamp(t)).orNull,
        ci.userId.orNull,
        ci.userName.orNull,
        ci.operation.orNull,
        ci.operationParameters.orNull,
        ci.readVersion.map(Long.box).orNull,
        ci.isolationLevel.orNull,
        ci.isBlindAppend.map(Boolean.box).orNull,
        ci.operationMetrics.orNull,
        ci.userMetadata.orNull,
        ci.engineInfo.orNull)
    }
  }
}

/** DESCRIBE DETAIL: schema is the output contract (mirrors
  * [[graft.delta.DeltaTable.detail]]); the log read happens in run(),
  * never at parse time. */
case class GraftDescribeDetailCommand(
    target: Either[String, Seq[String]]) extends LeafRunnableCommand {

  import org.apache.spark.sql.types.{ArrayType, IntegerType, MapType, TimestampType}

  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType)(),
    AttributeReference("id", StringType)(),
    AttributeReference("name", StringType)(),
    AttributeReference("location", StringType)(),
    AttributeReference("created_at", TimestampType)(),
    AttributeReference("last_modified", TimestampType)(),
    AttributeReference("partition_columns", ArrayType(StringType))(),
    AttributeReference("num_files", LongType)(),
    AttributeReference("size_in_bytes", LongType)(),
    AttributeReference("properties", MapType(StringType, StringType))(),
    AttributeReference("min_reader_version", IntegerType)(),
    AttributeReference("min_writer_version", IntegerType)())

  override def run(session: SparkSession): Seq[Row] = {
    graft.delta.DeltaTable.forPath(session,
      GraftSqlParser.resolvePath(session, target)).detail().collect().toSeq
  }
}

/** `SHOW TBLPROPERTIES '<path>' [('key')]` — the read-side complement of
  * SET/UNSET TBLPROPERTIES, answered from the snapshot's protocol+metadata
  * short-circuit (no file-state fold). Path targets only, same as
  * SET/UNSET — identifier targets delegate to Spark's native handling.
  * IO stays in run() (the GraftDescribeDetailCommand pattern), so EXPLAIN
  * and dry parsing never touch storage. Missing requested key mirrors
  * Spark's convention: one row whose value SAYS the property is absent. */
case class GraftShowPropertiesCommand(
    target: Either[String, Seq[String]],
    key: Option[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", StringType, nullable = false)(),
    AttributeReference("value", StringType)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(session, target)
    val props = graft.delta.DeltaLog.forTable(session, path)
      .update().metadata.configuration
    key match {
      case Some(k) =>
        Seq(Row(k, props.getOrElse(k,
          s"Table $path does not have property: $k")))
      case None =>
        props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
    }
  }
}

case class GraftVacuumCommand(
    target: Either[String, Seq[String]],
    retainHours: Option[Double],
    dryRun: Boolean = false,
    lite: Boolean = false) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("deleted_files", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(session, target)
    val deleted = graft.delta.DeltaTable.forPath(session, path)
      .vacuum(retainHours.map(h => (h * 3600 * 1000).toLong), dryRun,
        lite = lite)
    Seq(Row(path, deleted.toLong))
  }
}
