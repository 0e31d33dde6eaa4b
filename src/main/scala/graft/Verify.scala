package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // CLASS-SKEW GUARD (VERDICT r14 #3): a recompile racing this run
    // makes forked/loaded classes inconsistent (the r14 delta_copy_into
    // false failure); stamp the classes-dir fingerprint now and re-check
    // at the end so a skewed artifact self-reports and fails loudly.
    val fpStart = graft.tools.ClassFingerprint.current()
    // local-iteration filter (unset in driver runs): run only these names
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // the output parquet is written — this query's scratch tables are
      // dead; sweep so their writeback doesn't tax later queries
      try graft.queries.ScratchDirs.sweep() catch { case _: Throwable => }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val fpEnd = graft.tools.ClassFingerprint.current()
    val skew = fpStart != fpEnd
    Files.writeString(Paths.get(s"$outDir/class_skew.json"),
      s"""{"class_skew":$skew,"fingerprint_start":${q(fpStart)},""" +
        s""""fingerprint_end":${q(fpEnd)}}""")
    spark.stop()
    if (skew) {
      System.err.println(s"[verify] CLASS SKEW: classes changed mid-run " +
        s"($fpStart -> $fpEnd); results are untrustworthy. Recompile, " +
        "then re-run on a quiet tree.")
      sys.exit(1)
    }
  }
}
