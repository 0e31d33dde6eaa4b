package graft.delta

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.util.concurrent.TimeUnit

import graft.SparkSpec

/** Cross-PROCESS commit race: every other concurrency spec races threads
  * inside one JVM, where `DeltaLog.deltaLogLock` serializes attempts and
  * can mask what the filesystem rename must guarantee alone. Here a
  * second JVM (no shared locks, no shared DeltaLog cache) races commits
  * against this one through the local LogStore, so mutual exclusion
  * rests ENTIRELY on the store's atomic create-if-absent — the property
  * a multi-executor deployment actually depends on.
  *
  * Reference evidence shape: the cross-implementation concurrent-commit
  * suite (oss-compatibility-tests OSSCompatibilitySuite.scala:59-197)
  * races two independent engines on one table; two JVMs of the same
  * engine exercise the identical filesystem contract.
  */
class CrossProcessCommitSpec extends SparkSpec {

  /** Tag of the one assert the retry loop may treat as inconclusive. */
  private val InconclusiveMarker =
    "no cross-process collision was observed - the race proved nothing"

  /** The JDK17 module opens Spark needs when launched outside
    * spark-submit — mirrors build.sbt's jdk17AddOpens. */
  private def addOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two JVMs race commits through the filesystem alone: linearizable " +
      "versions, no lost commits, collisions observed and retried") {
    // under full-suite load the two processes can fail to overlap (the
    // child may drain its commits before the parent's first one lands),
    // observing zero collisions — a timing artifact, not a correctness
    // signal. ONLY that inconclusive case retries: a safety violation
    // (lost commit, version gap, clobber, child failure) is
    // probabilistic under a race, so retrying past one would launder a
    // genuine atomicity bug — those rethrow on FIRST occurrence.
    var lastFailure: Option[Throwable] = None
    val passed = (1 to 3).exists { attempt =>
      try { raceOnce(); true }
      catch {
        case t: org.scalatest.exceptions.TestFailedException
            if t.getMessage != null &&
              t.getMessage.contains(InconclusiveMarker) =>
          info(s"race attempt $attempt inconclusive: ${t.getMessage}")
          lastFailure = Some(t)
          false
      }
    }
    if (!passed) throw lastFailure.get
  }

  private def raceOnce(): Unit = {
    withTempDir { dir =>
      val n = 12
      // version 0 from this process
      DeltaTable.write(spark.range(1).toDF("v"), dir)

      val java = s"${System.getProperty("java.home")}/bin/java"
      val cmd = Seq(java) ++ addOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false",
        "-cp", System.getProperty("java.class.path"),
        "graft.delta.CrossProcessCommitRacer", dir, "child", n.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(false)
      val proc = pb.start()
      val fromChild = new BufferedReader(
        new InputStreamReader(proc.getInputStream, "UTF-8"))
      val toChild = new PrintWriter(proc.getOutputStream, true)
      // drain stderr so the child can't block on a full pipe
      val drainer = new Thread(() => {
        val err = new BufferedReader(
          new InputStreamReader(proc.getErrorStream, "UTF-8"))
        try { while (err.readLine() != null) () } catch { case _: Throwable => }
      })
      drainer.setDaemon(true)
      drainer.start()

      try {
        // barrier: wait for the child's Spark session, then both loops
        // start as close to simultaneously as two processes can
        var line = fromChild.readLine()
        while (line != null && line != "READY") line = fromChild.readLine()
        assert(line == "READY", "child never became ready")
        toChild.println("GO")

        val log = DeltaLog.forTable(spark, dir)
        var parentRetries = 0
        (0 until n).foreach { i =>
          val txn = log.startTransaction()
          txn.commit(
            Seq(AddFile(s"parent-$i.parquet", Map.empty, 1L, 1L,
              dataChange = true)), "RACE")
          parentRetries += txn.commitRetries
        }

        var done: String = null
        line = fromChild.readLine()
        while (line != null && done == null) {
          if (line.startsWith("DONE")) done = line
          else line = fromChild.readLine()
        }
        assert(done != null, "child exited without reporting DONE")
        assert(proc.waitFor(120, TimeUnit.SECONDS), "child did not exit")
        assert(proc.exitValue() == 0, s"child failed: exit ${proc.exitValue()}")
        val childRetries = done.split("retries=")(1).trim.toInt

        DeltaLog.clearCache()
        val fresh = DeltaLog.forTable(spark, dir)
        val snap = fresh.update()
        // linearizable: exactly 2n commits landed after v0, no gaps, no
        // clobbers — every version is a readable commit
        assert(snap.version == 2L * n,
          s"expected version ${2 * n}, got ${snap.version}")
        (0L to snap.version).foreach { v =>
          assert(fresh.getCommitInfoAt(v).version.contains(v))
        }
        // no lost commits: every payload from both processes is live
        val paths = snap.allFiles.map(_.path).toSet
        (0 until n).foreach { i =>
          assert(paths(s"parent-$i.parquet"), s"parent commit $i lost")
          assert(paths(s"child-$i.parquet"), s"child commit $i lost")
        }
        // the race must have actually collided: at least one commit in
        // one of the processes hit FileAlreadyExists on the log write
        // and went through conflict re-validation. This is the ONLY
        // assert the outer retry loop may swallow (see InconclusiveMarker)
        assert(parentRetries + childRetries >= 1, InconclusiveMarker)
        info(s"parent retries: $parentRetries, child retries: $childRetries")
      } finally {
        proc.destroyForcibly()
      }
    }
  }
}

/** Child-process entry: commits `n` synthetic AddFiles against an
  * existing table, one transaction each, through the standard commit
  * protocol — no coordination with the parent except stdout/stdin
  * barriers and the log directory itself. */
object CrossProcessCommitRacer {
  def main(args: Array[String]): Unit = {
    val Array(dir, tag, nStr) = args
    val n = nStr.toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName(s"racer-$tag")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val log = DeltaLog.forTable(spark, dir)
      log.update()
      println("READY")
      Console.flush()
      val in = new BufferedReader(new InputStreamReader(System.in, "UTF-8"))
      var line = in.readLine()
      while (line != null && line != "GO") line = in.readLine()
      require(line == "GO", "parent never said GO")
      var retries = 0
      (0 until n).foreach { i =>
        val txn = log.startTransaction()
        txn.commit(
          Seq(AddFile(s"$tag-$i.parquet", Map.empty, 1L, 1L,
            dataChange = true)), "RACE")
        retries += txn.commitRetries
      }
      println(s"DONE commits=$n retries=$retries")
      Console.flush()
    } finally {
      spark.stop()
    }
  }
}
