package graft.delta

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.util.concurrent.TimeUnit

import graft.SparkSpec
import graft.delta.storage.{CommitCoordinator, FileClaimCommitCoordinator}

/** Cross-PROCESS commit races through the NON-default stores (VERDICT
  * r11 #6). CrossProcessCommitSpec proves the rename LogStore's two-JVM
  * mutual exclusion; this spec gives the same ProcessBuilder treatment
  * to:
  *
  *  - [[graft.delta.storage.ObjectStoreLogStore]] — the put-if-absent
  *    emulation keeps a per-JVM write cache, so two processes share NO
  *    state: exclusion must come from the store's conditional create
  *    (O_EXCL on local filesystems since r12 — previously
  *    RawLocalFileSystem's check-then-act create left a cross-process
  *    clobber window);
  *  - [[graft.delta.storage.CoordinatedLogStore]] — claim/publish via a
  *    [[FileClaimCommitCoordinator]] whose claim file is the
  *    cross-process conditional put, plus the HEAL path: a writer that
  *    crashes between claim and publish must have its commit published
  *    by the next reader in a DIFFERENT process.
  */
class CrossProcessStoreSpec extends SparkSpec {

  private val InconclusiveMarker =
    "no cross-process collision was observed - the race proved nothing"

  private def addOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def launchRacer(args: Seq[String],
                          extraJvm: Seq[String] = Nil): Process = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false") ++ extraJvm ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.delta.CrossProcessStoreRacer") ++ args
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    val drainer = new Thread(() => {
      val err = new BufferedReader(
        new InputStreamReader(proc.getErrorStream, "UTF-8"))
      try { while (err.readLine() != null) () } catch { case _: Throwable => }
    })
    drainer.setDaemon(true)
    drainer.start()
    proc
  }

  /** Identical retry policy to CrossProcessCommitSpec: ONLY the
    * zero-collision inconclusive assert retries; safety violations fail
    * on first occurrence. */
  private def withInconclusiveRetry(race: => Unit): Unit = {
    var lastFailure: Option[Throwable] = None
    val passed = (1 to 3).exists { attempt =>
      try { race; true }
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

  private def raceAndVerify(dir: String, mode: String,
                            claimDir: String): Unit = {
    val n = 12
    val proc = launchRacer(Seq(dir, "child", n.toString, mode, claimDir))
    val fromChild = new BufferedReader(
      new InputStreamReader(proc.getInputStream, "UTF-8"))
    val toChild = new PrintWriter(proc.getOutputStream, true)
    try {
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
      assert(snap.version == 2L * n,
        s"expected version ${2 * n}, got ${snap.version}")
      (0L to snap.version).foreach { v =>
        assert(fresh.getCommitInfoAt(v).version.contains(v))
      }
      val paths = snap.allFiles.map(_.path).toSet
      (0 until n).foreach { i =>
        assert(paths(s"parent-$i.parquet"), s"parent commit $i lost")
        assert(paths(s"child-$i.parquet"), s"child commit $i lost")
      }
      assert(parentRetries + childRetries >= 1, InconclusiveMarker)
      info(s"[$mode] parent retries: $parentRetries, child: $childRetries")
    } finally {
      proc.destroyForcibly()
    }
  }

  test("ObjectStoreLogStore: two JVMs with NO shared write cache cannot " +
      "both win a version (O_EXCL conditional create)") {
    withInconclusiveRetry {
      withTempDir { dir =>
        val hc = spark.sparkContext.hadoopConfiguration
        hc.set("graft.logStore.file.impl",
          "graft.delta.storage.ObjectStoreLogStore")
        DeltaLog.clearCache()
        try {
          DeltaTable.write(spark.range(1).toDF("v"), dir)
          raceAndVerify(dir, "objectstore", "")
        } finally {
          hc.unset("graft.logStore.file.impl")
          DeltaLog.clearCache()
        }
      }
    }
  }

  test("CoordinatedLogStore: claim/publish through a file-claim " +
      "coordinator is linearizable across two JVMs") {
    withInconclusiveRetry {
      withTempDir { dir =>
        withTempDir { claimDir =>
          CommitCoordinator.register("xproc-file",
            new FileClaimCommitCoordinator(claimDir))
          DeltaLog.clearCache()
          DeltaTable.write(spark.range(1).toDF("v"), dir,
            configuration = Map(
              "delta.coordinatedCommits.commitCoordinator" -> "xproc-file"))
          raceAndVerify(dir, "coordinated", claimDir)
          DeltaLog.clearCache()
        }
      }
    }
  }

  test("CoordinatedLogStore heal path: a writer crashing between claim " +
      "and publish is healed by a reader in ANOTHER process") {
    withTempDir { dir =>
      withTempDir { claimDir =>
        CommitCoordinator.register("xproc-file",
          new FileClaimCommitCoordinator(claimDir))
        DeltaLog.clearCache()
        DeltaTable.write(spark.range(1).toDF("v"), dir,
          configuration = Map(
            "delta.coordinatedCommits.commitCoordinator" -> "xproc-file"))

        // the child claims the next version, stages its payload, and
        // exits WITHOUT publishing (simulated crash between steps 2 and 3)
        val proc = launchRacer(Seq(dir, "crasher", "1",
          "crash-after-claim", claimDir))
        val fromChild = new BufferedReader(
          new InputStreamReader(proc.getInputStream, "UTF-8"))
        try {
          var line = fromChild.readLine()
          var crashed = false
          while (line != null && !crashed) {
            if (line.startsWith("CRASHED")) crashed = true
            else line = fromChild.readLine()
          }
          assert(crashed, "child never reported its staged claim")
          assert(proc.waitFor(120, TimeUnit.SECONDS), "child did not exit")
        } finally proc.destroyForcibly()

        // this process never saw the claim happen; its next read must
        // heal the orphan: the crashed writer's commit becomes version 1
        DeltaLog.clearCache()
        val snap = DeltaLog.forTable(spark, dir).update()
        assert(snap.version == 1L,
          s"heal must publish the claimed commit, version=${snap.version}")
        assert(snap.allFiles.exists(_.path == "crasher-healed.parquet"),
          "the healed commit's payload must be live")
        DeltaLog.clearCache()
      }
    }
  }
}

/** Child-process entry for the store-parameterized races.
  *
  * Modes:
  *  - `objectstore`: route the log through ObjectStoreLogStore (per-JVM
  *    write cache; exclusion rests on the O_EXCL create) and commit n
  *    AddFiles, reporting conflict retries;
  *  - `coordinated`: register the shared FileClaimCommitCoordinator and
  *    commit through the table's declared coordinator;
  *  - `crash-after-claim`: stage a commit payload, win the coordinator
  *    claim for the next version, then EXIT without publishing — the
  *    parent proves any later reader heals it. */
object CrossProcessStoreRacer {
  def main(args: Array[String]): Unit = {
    val Array(dir, tag, nStr, mode, claimDir) = args
    val n = nStr.toInt
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName(s"store-racer-$tag")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (mode == "objectstore") {
      builder.config("spark.hadoop.graft.logStore.file.impl",
        "graft.delta.storage.ObjectStoreLogStore")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (mode == "coordinated" || mode == "crash-after-claim") {
      CommitCoordinator.register("xproc-file",
        new FileClaimCommitCoordinator(claimDir))
    }
    try {
      val log = DeltaLog.forTable(spark, dir)
      log.update()
      mode match {
        case "crash-after-claim" =>
          // replicate the store's write protocol, stopping after step 2
          val next = log.update().version + 1
          val commitPath = FileNames.deltaFile(log.logPath, next)
          val logDir = commitPath.getParent
          val temp = new org.apache.hadoop.fs.Path(logDir,
            s".${commitPath.getName}.${java.util.UUID.randomUUID()}.tmp")
          val lines = Seq(
            JsonCodec.toJson(CommitInfo(
              version = Some(next), timestamp = Some(1L),
              operation = Some("CRASH"))),
            JsonCodec.toJson(AddFile("crasher-healed.parquet", Map.empty,
              1L, 1L, dataChange = true)))
          val fs = logDir.getFileSystem(log.hadoopConf)
          val out = fs.create(temp, false)
          try lines.foreach(l => out.write((l + "\n").getBytes("UTF-8")))
          finally out.close()
          val claimed = CommitCoordinator.forName("xproc-file").get
            .prepareCommit(logDir.toUri.toString, commitPath.getName,
              temp.toUri.toString)
          require(claimed, "crasher lost an uncontended claim")
          println("CRASHED staged=" + temp)
          Console.flush()
        case _ =>
          println("READY")
          Console.flush()
          val in = new BufferedReader(
            new InputStreamReader(System.in, "UTF-8"))
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
      }
    } finally {
      spark.stop()
    }
  }
}
