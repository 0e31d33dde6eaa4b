package graft.delta

import org.apache.hadoop.fs.Path

import graft.SparkSpec
import graft.delta.storage.{CommitCoordinator, FileClaimCommitCoordinator,
  InMemoryCommitCoordinator}

/** Deferred backfill for coordinated commits (VERDICT r14 #2 —
  * delta-spark's commit-owner model with backfillBatchSize > 1): the
  * coordinator claim IS the commit; the `_delta_log/<v>.json` rename is
  * a batched afterthought. Coordinated readers serve the deferred tail
  * by merging the staged layout into the log listing; plain readers see
  * only the backfilled prefix; a checkpoint pointer forces a full
  * backfill first; and a "process restart" over a durable coordinator
  * converges from the staged layout alone. */
class CoordinatedBackfillCadenceSpec extends SparkSpec {
  import spark.implicits._

  private def enableCoordination(dir: String, name: String,
                                 cadence: Int): DeltaLog = {
    DeltaTable.write(Seq((1L, "a")).toDF("id", "v"), dir) // v0
    val log = DeltaLog.forTable(spark, dir)
    val txn = log.startTransaction()
    val m = txn.snapshot.metadata
    txn.updateMetadata(m.copy(configuration = m.configuration ++ Map(
      "delta.coordinatedCommits.commitCoordinator-preview" -> name,
      "delta.coordinatedCommits.backfillBatchSize" -> cadence.toString)))
    txn.commit(Nil, "SET TBLPROPERTIES") // v1, through the old store
    log.update()
    log
  }

  private def jsonExists(log: DeltaLog, v: Long): Boolean = {
    val p = FileNames.deltaFile(log.logPath, v)
    p.getFileSystem(log.hadoopConf).exists(p)
  }

  test("cadence 3: commits defer; coordinated reader sees the staged tip; " +
    "the batch boundary backfills all") {
    withTempDir { dir =>
      CommitCoordinator.register("cadence-a", new InMemoryCommitCoordinator)
      val log = enableCoordination(dir, "cadence-a", 3)
      DeltaTable.write(Seq((2L, "b")).toDF("id", "v"), dir) // v2 deferred
      DeltaTable.write(Seq((3L, "c")).toDF("id", "v"), dir) // v3 deferred
      assert(!jsonExists(log, 2) && !jsonExists(log, 3),
        "2 pending < cadence 3: the plain log must not have v2/v3 yet")
      val stagedDir = FileNames.stagedCommitDir(log.logPath)
      val fs = stagedDir.getFileSystem(log.hadoopConf)
      assert(fs.listStatus(stagedDir).exists(
        _.getPath.getName.startsWith(f"${2L}%020d.")),
        "the deferred commit must live in the staged layout")
      // the COORDINATED reader serves the deferred tail
      assert(log.update().version == 3)
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 3)
      // walkers over the deferred tail: history (commitInfo line-scans),
      // changes (store.read), time travel (listing + replay)
      assert(log.history().map(_.version.get).max == 3)
      assert(log.getChanges(2).map(_._1).toVector == Vector(2L, 3L))
      assert(log.getSnapshotForVersionAsOf(3).version == 3)
      // third coordinated commit crosses the cadence: ALL deferred
      // commits land in the plain log, in order, with no hole
      DeltaTable.write(Seq((4L, "d")).toDF("id", "v"), dir) // v4 -> backfill
      assert(jsonExists(log, 2) && jsonExists(log, 3) && jsonExists(log, 4),
        "the cadence boundary must publish every deferred commit")
      // copy-backfill: the staged payloads survive for in-flight readers
      assert(fs.listStatus(stagedDir).exists(
        _.getPath.getName.startsWith(f"${2L}%020d.")),
        "backfill must COPY (a replay job may hold the staged path)")
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 4)
    }
  }

  test("plain reader sees only the backfilled prefix while a coordinated " +
    "reader sees the staged tip") {
    withTempDir { dir =>
      CommitCoordinator.register("cadence-b", new InMemoryCommitCoordinator)
      val log = enableCoordination(dir, "cadence-b", 4)
      DeltaTable.write(Seq((2L, "b")).toDF("id", "v"), dir) // v2 deferred
      DeltaTable.write(Seq((3L, "c")).toDF("id", "v"), dir) // v3 deferred
      assert(log.update().version == 3)
      // a process that does NOT know the coordinator resolves through
      // UnknownCoordinatorLogStore -> plain listing -> backfilled prefix
      CommitCoordinator.unregister("cadence-b")
      DeltaLog.clearCache()
      try {
        val plainLog = DeltaLog.forTable(spark, dir)
        assert(plainLog.update().version == 1,
          s"plain reader must see the backfilled prefix (v1), " +
            s"got ${plainLog.snapshot.version}")
        assert(DeltaTable.forPath(spark, dir).toDF.count() == 1)
      } finally {
        CommitCoordinator.register("cadence-b", new InMemoryCommitCoordinator)
      }
      // NOTE: the re-registered coordinator above is FRESH (empty) — the
      // in-memory coordinator does not survive "process death". The
      // durable-coordinator restart path is the FileClaim test below.
      DeltaLog.clearCache()
    }
  }

  test("a checkpoint pointer forces a full backfill first") {
    withTempDir { dir =>
      CommitCoordinator.register("cadence-c", new InMemoryCommitCoordinator)
      val log = enableCoordination(dir, "cadence-c", 10)
      DeltaTable.write(Seq((2L, "b")).toDF("id", "v"), dir) // v2 deferred
      DeltaTable.write(Seq((3L, "c")).toDF("id", "v"), dir) // v3 deferred
      assert(!jsonExists(log, 2) && !jsonExists(log, 3))
      Checkpoints.writeCheckpoint(log.update())
      assert(jsonExists(log, 2) && jsonExists(log, 3),
        "_last_checkpoint must never advertise state the plain log " +
          "cannot list")
      // and the pointer itself landed
      val lc = new Path(log.logPath, "_last_checkpoint")
      assert(lc.getFileSystem(log.hadoopConf).exists(lc))
    }
  }

  test("restart over a durable coordinator converges from the staged " +
    "layout; distributed replay reads deferred commits") {
    withTempDir { dir =>
      withTempDir { coordRoot =>
        CommitCoordinator.register("cadence-d",
          new FileClaimCommitCoordinator(coordRoot))
        val log = enableCoordination(dir, "cadence-d", 3)
        DeltaTable.write(Seq((2L, "b")).toDF("id", "v"), dir) // v2 deferred
        DeltaTable.write(Seq((3L, "c")).toDF("id", "v"), dir) // v3 deferred
        assert(!jsonExists(log, 2) && !jsonExists(log, 3))
        // "process restart": drop every in-memory trace; only the staged
        // files + the durable claims survive
        DeltaLog.clearCache()
        CommitCoordinator.register("cadence-d",
          new FileClaimCommitCoordinator(coordRoot))
        val log2 = DeltaLog.forTable(spark, dir)
        assert(log2.update().version == 3,
          "the restarted coordinated reader must recover the staged tip")
        // force the DISTRIBUTED replay over the deferred tail: executors
        // must read the physical staged paths (the logical ones do not
        // exist) and extract the right versions from the staged names
        spark.conf.set(Snapshot.DriverStateMaxBytesKey, "1")
        try {
          DeltaLog.clearCache()
          val t = DeltaTable.forPath(spark, dir)
          assert(t.toDF.count() == 3)
          assert(t.toDF.as[(Long, String)].collect().toSet ==
            Set((1L, "a"), (2L, "b"), (3L, "c")))
        } finally spark.conf.unset(Snapshot.DriverStateMaxBytesKey)
        // the next commit crosses the cadence and publishes everything —
        // including the "crashed" writer's deferred commits
        DeltaTable.write(Seq((4L, "d")).toDF("id", "v"), dir)
        assert(jsonExists(log2, 2) && jsonExists(log2, 3) &&
          jsonExists(log2, 4),
          "crash-heal must converge through the batched backfill")
        assert(DeltaTable.forPath(spark, dir).toDF.count() == 4)
      }
    }
  }

  test("a streaming read drains the deferred tail") {
    withTempDir { dir =>
      withTempDir { ckpt =>
        CommitCoordinator.register("cadence-f", new InMemoryCommitCoordinator)
        val log = enableCoordination(dir, "cadence-f", 5)
        DeltaTable.write(Seq((2L, "b")).toDF("id", "v"), dir) // v2 deferred
        DeltaTable.write(Seq((3L, "c")).toDF("id", "v"), dir) // v3 deferred
        assert(!jsonExists(log, 2) && !jsonExists(log, 3))
        // the source lists commits through the coordinated merge and
        // line-scans them through the staged fallback
        val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
        val q = spark.readStream.format("graft-delta").load(dir)
          .writeStream.foreachBatch {
            (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              batch.select("id").as[Long].collect().foreach(seen.add)
              ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(60000)
        import scala.jdk.CollectionConverters._
        assert(seen.asScala.toSet == Set(1L, 2L, 3L),
          s"the stream must serve the deferred commits too, got " +
            s"${seen.asScala.toSet}")
      }
    }
  }

  test("a conflicting writer retries against a deferred winner") {
    withTempDir { dir =>
      CommitCoordinator.register("cadence-g", new InMemoryCommitCoordinator)
      val log = enableCoordination(dir, "cadence-g", 5)
      // both transactions read the same snapshot
      val txnA = log.startTransaction()
      val txnB = log.startTransaction()
      val addA = AddFile("a.parquet", Map.empty, 1L, 1L, dataChange = true)
      val addB = AddFile("b.parquet", Map.empty, 1L, 1L, dataChange = true)
      txnA.commit(Seq(addA), DeltaOperations.ManualUpdate) // v2, DEFERRED
      assert(!jsonExists(log, 2), "the winner must be claim-only")
      // B loses the v2 claim, reads the STAGED winner in its retry
      // conflict check (disjoint appends -> no conflict), lands at v3
      txnB.commit(Seq(addB), DeltaOperations.ManualUpdate)
      val snap = log.update()
      assert(snap.version == 3,
        s"the retried commit must land after the deferred winner, " +
          s"got ${snap.version}")
      assert(!jsonExists(log, 2) && !jsonExists(log, 3),
        "2 pending < cadence 5: both commits stay deferred")
      val paths = snap.allFiles.map(_.path).toSet
      assert(paths.contains("a.parquet") && paths.contains("b.parquet"),
        s"both writers' files must be live: $paths")
    }
  }

  test("cadence 1 (default) keeps the inline-publish behavior") {
    withTempDir { dir =>
      CommitCoordinator.register("cadence-e", new InMemoryCommitCoordinator)
      val log = enableCoordination(dir, "cadence-e", 1)
      DeltaTable.write(Seq((2L, "b")).toDF("id", "v"), dir)
      assert(jsonExists(log, 2), "cadence 1 must publish inline")
    }
  }
}
