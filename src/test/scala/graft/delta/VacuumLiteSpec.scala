package graft.delta

import java.io.File
import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** `VACUUM … LITE`: log-derived candidates (no table listing), the
  * VACUUM START/END logging commits, and the recorded-cutoff boundary
  * that keeps repeat LITE runs from re-scanning covered commits.
  * Tables enable in-commit timestamps so the manual clock governs the
  * version↔timestamp mapping the boundary uses (file mtimes are real
  * wall-clock and would defeat a manual-clock boundary test). */
class VacuumLiteSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 24L * 3600 * 1000
  private val IctOn = Map("delta.enableInCommitTimestamps" -> "true")

  test("LITE deletes tombstoned files but never untracked junk; " +
      "FULL cleans the junk") {
    withTempDir { dir =>
      (1 to 4).foreach(i =>
        DeltaTable.write(Seq(i).toDF("v"), dir, configuration = IctOn))
      val log = DeltaLog.forTable(spark, dir)
      val table = DeltaTable.forPath(spark, dir)
      val start = 3000000000000L
      log.clock = () => start
      table.compact() // 4 tombstones with delTimestamp = start

      // untracked junk the log never saw (a crashed writer's leftover)
      val junk = new File(dir, "stray-orphan.parquet")
      Files.write(junk.toPath, Array[Byte](1, 2, 3))

      // young tombstones: LITE protects them like FULL does
      assert(table.vacuum(lite = true) == 0)

      log.clock = () => start + 8L * Day
      val deleted = table.vacuum(lite = true)
      assert(deleted >= 4, s"deleted only $deleted")
      assert(junk.exists(),
        "LITE must not touch files the log never tracked")
      assert(table.toDF.as[Int].collect().sorted.toSeq == (1 to 4),
        "active data must survive")

      // FULL lists the directory and sweeps the orphan too
      assert(DeltaTable.forPath(spark, dir).vacuum() >= 1)
      assert(!junk.exists(), "FULL vacuum must clean untracked junk")
    }
  }

  test("LITE records VACUUM START/END commits; END carries the cutoff") {
    withTempDir { dir =>
      DeltaTable.write((1 to 3).toDF("v"), dir, configuration = IctOn)
      val log = DeltaLog.forTable(spark, dir)
      val table = DeltaTable.forPath(spark, dir)
      val start = 3000000000000L
      log.clock = () => start
      table.compact()
      log.clock = () => start + 8L * Day
      table.vacuum(lite = true)

      val ops = log.history().flatMap(_.operation)
      assert(ops.take(2) == Seq("VACUUM END", "VACUUM START"),
        s"newest-first operations: $ops")
      val end = log.history().find(_.operation.contains("VACUUM END")).get
      val params = end.operationParameters.get
      assert(params("mode") == "LITE")
      assert(params("cutoffMillis").toLong == start + 1L * Day,
        s"cutoff must be clock - retention: $params")
      assert(end.operationMetrics.exists(_.contains("numDeletedFiles")))

      // plain FULL vacuum stays silent unless logging is opted in
      val before = log.update().version
      table.vacuum()
      assert(log.update().version == before,
        "FULL vacuum must not commit with logging disabled")
    }
  }

  test("second LITE run scans only commits after the recorded cutoff") {
    withTempDir { dir =>
      DeltaTable.write(Seq(1).toDF("v").coalesce(1), dir,
        configuration = IctOn)
      DeltaTable.write(Seq(2).toDF("v").coalesce(1), dir)
      val log = DeltaLog.forTable(spark, dir)
      val table = DeltaTable.forPath(spark, dir)
      val start = 3000000000000L
      log.clock = () => start
      val tombA = log.update().allFiles.head.path
      table.compact() // tombstone A at ts=start

      log.clock = () => start + 8L * Day
      assert(table.vacuum(lite = true) >= 1) // deletes A's file

      // resurrect A's path on disk: only a scan of A's (pre-boundary)
      // commit could re-delete it — the boundary must skip that commit
      val fakeA = Paths.get(dir, tombA)
      Files.createDirectories(fakeA.getParent)
      Files.write(fakeA, Array[Byte](9))

      // new churn after the first vacuum: tombstone B at start + 8d
      DeltaTable.write(Seq(3).toDF("v").coalesce(1), dir)
      DeltaTable.write(Seq(4).toDF("v").coalesce(1), dir)
      table.compact()

      log.clock = () => start + 16L * Day
      val deleted = table.vacuum(lite = true)
      assert(deleted >= 1, "the new tombstone's file must vacuum out")
      assert(Files.exists(fakeA),
        "a commit before the recorded cutoff must not be re-scanned")
      assert(table.toDF.as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
    }
  }

  test("SQL: VACUUM … LITE with RETAIN and DRY RUN") {
    withTempDir { dir =>
      DeltaTable.write((1 to 3).toDF("v"), dir, configuration = IctOn)
      val log = DeltaLog.forTable(spark, dir)
      val table = DeltaTable.forPath(spark, dir)
      val start = 3000000000000L
      log.clock = () => start
      table.compact()
      log.clock = () => start + 8L * Day

      val preDry = log.update().version
      val dry = spark.sql(s"VACUUM '$dir' LITE RETAIN 168 HOURS DRY RUN")
        .collect().head.getLong(1)
      assert(dry >= 1, s"dry run saw $dry")
      assert(log.update().version == preDry, "DRY RUN must not commit")
      val ran = spark.sql(s"VACUUM '$dir' LITE RETAIN 168 HOURS")
        .collect().head.getLong(1)
      assert(ran == dry)
      assert(table.toDF.count() == 3)
    }
  }

  test("LITE vacuums the deletion-vector bin of a purged shade") {
    withTempDir { dir =>
      DeltaTable.write((1 to 100).toDF("v").coalesce(1), dir,
        configuration = IctOn ++
          Map("delta.enableDeletionVectors" -> "true"))
      val log = DeltaLog.forTable(spark, dir)
      val table = DeltaTable.forPath(spark, dir)
      val start = 3000000000000L
      log.clock = () => start
      table.delete($"v" <= 10) // shades via DV, writes a bin
      def bins(): Seq[File] =
        new File(dir).listFiles().toSeq
          .filter(f => f.getName.startsWith("deletion_vector_") ||
            f.getName.endsWith(".bin"))
      assert(bins().nonEmpty, "expected a DV bin on disk")
      table.compact() // purge: removes (path, dv), rewrites survivors

      log.clock = () => start + 8L * Day
      assert(table.vacuum(lite = true) >= 1)
      assert(bins().isEmpty,
        s"purged DV bin must vacuum out, still present: ${bins()}")
      assert(table.toDF.count() == 90)
    }
  }
}
