package graft.delta.write

import java.security.MessageDigest

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

import graft.delta._

/** `COPY INTO`: idempotent bulk file ingestion into an existing Delta
  * table — the retryable "load whatever landed in the bucket" front door
  * of a 100 TB ingest pipeline. delta-spark keeps this surface
  * Databricks-side; the semantics re-expressed here are the documented
  * ones: files already loaded are skipped on re-run, so the statement can
  * sit in a cron loop or a failure-retrying orchestrator and never
  * double-load (the reference's closest analogue is the import tool's
  * bounded re-runnable chunks, `sql-delta-import/.../ImportRunner.scala`,
  * which relies on overwrite rather than tracking).
  *
  * Idempotency design: one [[SetTransaction]] per source file, committed
  * ATOMICALLY with the AddFiles it produced — appId is a hash of the
  * file's canonical path, version its modificationTime. A re-run lists
  * the source, drops every file whose recorded version is >= its current
  * mtime (a file REWRITTEN in place gets a newer mtime and reloads — the
  * "new data, same name" case), and appends only the remainder. This is
  * the same contract the streaming sink and txnAppId/txnVersion batch
  * writes already use (F7/F8), so conflict detection, checkpointing and
  * state reconstruction all carry it for free; state grows by one txn
  * action per source file ever loaded — the same order as the table's own
  * AddFile count, and expirable via delta.setTransactionRetentionDuration
  * (after which a re-run of ANCIENT files would reload them, the
  * documented retention tradeoff).
  */
object CopyInto {

  case class CopyResult(version: Long, filesLoaded: Long, rowsLoaded: Long,
                        filesSkipped: Long)

  /** Stable per-source-file transaction id. Canonical (fs-qualified) path
    * keyed so `/data/x.parquet` via different mount spellings dedupes. */
  private[delta] def fileAppId(canonicalPath: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val hex = md.digest(canonicalPath.getBytes("UTF-8"))
      .take(16).map("%02x".format(_)).mkString
    s"graft.copyInto.$hex"
  }

  def run(spark: SparkSession,
          tablePath: String,
          source: String,
          format: String = "parquet",
          pattern: Option[String] = None,
          force: Boolean = false,
          formatOptions: Map[String, String] = Map.empty): CopyResult = {
    // Concurrent COPY INTO of the same files: the skip decision is made
    // from a snapshot, the commit registers each appId as read, so a
    // racing loader that lands first raises ConcurrentTransactionException
    // here — re-list, re-skip (the winner's files now show as loaded) and
    // try again rather than double-load or fail the cron job.
    var attempts = 0
    while (true) {
      try return runOnce(spark, tablePath, source, format, pattern, force,
        formatOptions)
      catch {
        case e: graft.delta.txn.ConcurrentTransactionException =>
          attempts += 1
          if (attempts >= 3) throw e
      }
    }
    sys.error("unreachable")
  }

  private def runOnce(spark: SparkSession,
                      tablePath: String,
                      source: String,
                      format: String,
                      pattern: Option[String],
                      force: Boolean,
                      formatOptions: Map[String, String]): CopyResult = {
    val deltaLog = DeltaLog.forTable(spark, tablePath)
    require(deltaLog.tableExists,
      s"COPY INTO requires an existing Delta table at $tablePath " +
        "(create it first; COPY INTO never infers a table)")
    val fmt = format.toLowerCase
    require(Set("parquet", "csv", "json", "text")(fmt),
      s"COPY INTO FILEFORMAT $format not supported " +
        "(parquet, csv, json, text)")

    val hConf = deltaLog.hadoopConf
    val srcPath = new Path(source)
    val fs = srcPath.getFileSystem(hConf)

    // Listing: an explicit PATTERN globs relative to the source; a bare
    // source directory lists recursively (landed data often arrives in
    // date-stamped subdirectories). Hidden files (`_`/`.` prefixed) are
    // other systems' metadata — Spark job markers, checksums — never data.
    val files: Array[FileStatus] = {
      val matched: Array[FileStatus] = pattern match {
        case Some(g) =>
          Option(fs.globStatus(new Path(srcPath, g))).getOrElse(Array.empty)
        case None => Array(fs.getFileStatus(srcPath))
      }
      val out = ArrayBuffer.empty[FileStatus]
      val stack = scala.collection.mutable.Stack(matched.toSeq: _*)
      while (stack.nonEmpty) {
        val st = stack.pop()
        val name = st.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) {
          if (st.isDirectory) stack.pushAll(fs.listStatus(st.getPath))
          else if (st.getLen > 0) out += st
        }
      }
      out.toArray
    }
    require(files.nonEmpty,
      s"COPY INTO found no data files under $source" +
        pattern.fold("")(p => s" matching $p"))

    // Skip decision against the CURRENT snapshot's transaction versions.
    // The recorded version is the file's mtime at load; >= means "this
    // exact or a newer load already landed". The check re-runs inside the
    // commit's own txnVersion reads, so a concurrent COPY INTO of the
    // same file conflicts-and-retries rather than double-loading.
    val snapshot = deltaLog.update()
    val recorded: Map[String, Long] =
      snapshot.setTransactions.map(t => t.appId -> t.version).toMap
    val keyed = files.map { f =>
      val canonical = fs.makeQualified(f.getPath).toString
      (f, canonical, fileAppId(canonical))
    }
    val (skipped, fresh) = keyed.partition { case (f, _, appId) =>
      !force && recorded.get(appId).exists(_ >= f.getModificationTime)
    }
    if (fresh.isEmpty) {
      return CopyResult(snapshot.version, 0L, 0L, skipped.length.toLong)
    }

    // Read with the TABLE's schema as the contract: self-describing
    // parquet aligns by name (extra source columns are dropped, missing
    // ones are an error — silently null-filling a fact column is how bad
    // ingest corrupts a table); csv/json/text parse INTO the declared
    // schema, never infer one.
    val tableSchema = snapshot.metadata.schema
    val paths = fresh.map(_._2).toSeq
    val df = fmt match {
      case "parquet" =>
        val raw = spark.read.options(formatOptions).parquet(paths: _*)
        val missing = tableSchema.fieldNames.filterNot(n =>
          raw.schema.fieldNames.exists(_.equalsIgnoreCase(n)))
        require(missing.isEmpty,
          s"COPY INTO source lacks table columns: ${missing.mkString(", ")}")
        // the sampled merged schema above only proves SOME file carries
        // each column — an individual file missing one would silently
        // null-fill its rows, the exact corruption this guard refuses.
        // Check every footer in a Spark job (the fresh list is the
        // commit payload, so the result is bounded).
        locally {
          val sconf = new graft.delta.SerializableHadoopConf(
            deltaLog.hadoopConf)
          val required = tableSchema.fieldNames.toSeq
          val perFileMissing = spark.sparkContext
            .parallelize(paths, math.max(1, math.min(paths.size, 32)))
            .flatMap { p =>
              val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
                org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                  new org.apache.hadoop.fs.Path(p), sconf.value))
              val names =
                try {
                  import scala.jdk.CollectionConverters._
                  reader.getFileMetaData.getSchema.getFields.asScala
                    .map(_.getName).toSet
                } finally reader.close()
              val m = required.filterNot(r =>
                names.exists(_.equalsIgnoreCase(r)))
              if (m.isEmpty) None else Some(s"$p lacks ${m.mkString(", ")}")
            }.collect()
          require(perFileMissing.isEmpty,
            "COPY INTO source files lack table columns (refusing to " +
              s"null-fill): ${perFileMissing.take(3).mkString("; ")}")
        }
        // store-assignment alignment: a LOSSLESS up-cast (int file column
        // into a bigint table column — the classic landed-data mismatch)
        // converts silently; anything lossy refuses rather than truncate
        // on the ingest path where nobody is looking.
        raw.select(tableSchema.fields.map { f =>
          val src = raw.schema.fields
            .find(_.name.equalsIgnoreCase(f.name)).get
          if (src.dataType == f.dataType) col(src.name).as(f.name)
          else if (org.apache.spark.sql.catalyst.expressions.Cast
              .canUpCast(src.dataType, f.dataType)) {
            col(src.name).cast(f.dataType).as(f.name)
          } else throw new IllegalArgumentException(
            s"COPY INTO cannot safely cast column ${f.name}: " +
              s"${src.dataType.simpleString} -> ${f.dataType.simpleString}")
        }.toSeq: _*)
      case other =>
        spark.read.options(formatOptions).schema(tableSchema)
          .format(other).load(paths: _*)
    }

    val txns = fresh.map { case (f, _, appId) =>
      SetTransaction(appId, f.getModificationTime, Some(deltaLog.clock()))
    }.toSeq
    val version = DeltaWriter.write(df, tablePath, SaveMode.Append,
      operation = "COPY INTO", extraTxns = txns,
      operationParameters = Map(
        "source" -> source,
        "fileFormat" -> fmt,
        "numSourceFiles" -> fresh.length))
    val rows = deltaLog.getCommitInfoAt(version).operationMetrics
      .flatMap(_.get("numOutputRows")).map(_.toLong).getOrElse(0L)
    CopyResult(version, fresh.length.toLong, rows, skipped.length.toLong)
  }
}
