package graft.delta

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}

import graft.SparkSpec
import graft.delta.storage._

/** The external-commit-coordinator seam (VERDICT r4 item 7): put-if-absent
  * decided by a pluggable [[CommitCoordinator]] instead of the filesystem,
  * so MULTIPLE writer processes/clusters sharing one object-store table
  * get real mutual exclusion. Covers the LogStore contract, the
  * multi-writer race (two store instances = two "clusters", one shared
  * coordinator), and crash recovery of claimed-but-unpublished commits. */
class CoordinatedLogStoreSpec extends SparkSpec {

  private val conf = new Configuration()

  private def newPair(): (CoordinatedLogStore, CoordinatedLogStore) = {
    val coord = new InMemoryCommitCoordinator
    (new CoordinatedLogStore(coord), new CoordinatedLogStore(coord))
  }

  test("contract: write/read round-trip, no-overwrite exclusion, sorted listFrom") {
    withTempDir { dir =>
      val (store, _) = newPair()
      val p = new Path(s"$dir/00000000000000000000.json")
      store.write(p, Iterator("a", "b"), overwrite = false, conf)
      assert(store.read(p, conf) == Seq("a", "b"))

      intercept[FileAlreadyExistsException] {
        store.write(p, Iterator("clobber"), overwrite = false, conf)
      }
      assert(store.read(p, conf) == Seq("a", "b"), "loser must not mutate")

      store.write(new Path(s"$dir/00000000000000000001.json"),
        Iterator("c"), overwrite = false, conf)
      val names = store.listFrom(new Path(s"$dir/00000000000000000000.json"), conf)
        .map(_.getPath.getName).toSeq
      assert(names == Seq("00000000000000000000.json", "00000000000000000001.json"))

      // overwrite mode (the _last_checkpoint path) replaces content
      store.write(p, Iterator("new"), overwrite = true, conf)
      assert(store.read(p, conf) == Seq("new"))
    }
  }

  test("two clusters, one coordinator: exactly one writer wins each version") {
    withTempDir { dir =>
      val (a, b) = newPair()
      val stores = Array(a, b, a, b, a, b, a, b)
      val target = new Path(s"$dir/00000000000000000005.json")
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(8)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val losses = new java.util.concurrent.atomic.AtomicInteger(0)
      (0 until 8).foreach { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            try {
              stores(i).write(target, Iterator(s"writer-$i"),
                overwrite = false, conf)
              wins.incrementAndGet()
            } catch {
              case _: FileAlreadyExistsException => losses.incrementAndGet()
            }
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(30, TimeUnit.SECONDS))
      assert(wins.get() == 1, s"exactly one winner, got ${wins.get()}")
      assert(losses.get() == 7)
      val content = a.read(target, conf)
      assert(content.size == 1 && content.head.startsWith("writer-"))
    }
  }

  test("a crash between claim and publish is healed by any reader") {
    withTempDir { dir =>
      val coord = new InMemoryCommitCoordinator
      val writer = new CoordinatedLogStore(coord)
      val reader = new CoordinatedLogStore(coord)
      val fs = new Path(dir).getFileSystem(conf)

      // simulate the crashing writer: payload staged, claim taken,
      // final object never published
      val dest = new Path(s"$dir/00000000000000000003.json")
      val temp = new Path(s"$dir/.00000000000000000003.json.crashed.tmp")
      val out = fs.create(temp, false)
      out.write("crashed-payload\n".getBytes("UTF-8"))
      out.close()
      assert(coord.prepareCommit(new Path(dir).toUri.toString,
        dest.getName, temp.toUri.toString))
      assert(!fs.exists(dest))

      // ANY other participant's next log access publishes the commit
      val listed = reader.listFrom(new Path(s"$dir/00000000000000000000.json"), conf)
        .map(_.getPath.getName).toSeq
      assert(listed.contains(dest.getName), s"recovered commit missing: $listed")
      assert(reader.read(dest, conf) == Seq("crashed-payload"))

      // and a late retry of the same version by a NEW writer loses cleanly
      intercept[FileAlreadyExistsException] {
        writer.write(dest, Iterator("late"), overwrite = false, conf)
      }
      assert(reader.read(dest, conf) == Seq("crashed-payload"))
    }
  }

  test("end-to-end: transactions commit through the coordinated store") {
    withTempDir { dir =>
      import spark.implicits._
      spark.sparkContext.hadoopConfiguration.set("graft.logStore.file.impl",
        "graft.delta.storage.CoordinatedLogStore")
      try {
        DeltaLog.invalidate(spark, dir)
        DeltaTable.write(Seq((1L, "a")).toDF("id", "v"), dir)
        val log = DeltaLog.forTable(spark, dir)
        assert(log.store.isInstanceOf[CoordinatedLogStore],
          s"expected coordinated store, got ${log.store.getClass}")
        // concurrent appends race through the coordinator's claim and the
        // txn retry loop; all must land
        val pool = Executors.newFixedThreadPool(4)
        (0 until 4).foreach { i =>
          pool.submit(new Runnable {
            def run(): Unit =
              DeltaTable.write(Seq((10L + i, s"t$i")).toDF("id", "v"), dir)
          })
        }
        pool.shutdown()
        assert(pool.awaitTermination(60, TimeUnit.SECONDS))
        assert(DeltaTable.forPath(spark, dir).toDF.count() == 5L)
        assert(log.update().version == 4L)
      } finally {
        spark.sparkContext.hadoopConfiguration.unset("graft.logStore.file.impl")
        DeltaLog.invalidate(spark, dir)
      }
    }
  }

  test("FileClaimCommitCoordinator: a claim always carries its payload; " +
      "an externally corrupted (empty) claim is reclaimed after the grace " +
      "period, never silently skipped forever") {
    withTempDir { root =>
      val claimRoot = s"$root/claims"
      // grace 0 = reclaim immediately once detected
      val coord = new storage.FileClaimCommitCoordinator(claimRoot, 0L)
      assert(coord.prepareCommit("t1", "00001.json", "/staged/x"))
      // atomic-link publish: the claim that exists is fully written
      assert(coord.pending("t1") == Seq(("00001.json", "/staged/x")))
      assert(!coord.prepareCommit("t1", "00001.json", "/staged/y"))

      // corrupt the claim externally (truncate to zero bytes) — the shape
      // a non-atomic create-then-write could have left behind on a crash
      val claim = java.nio.file.Files.walk(java.nio.file.Paths.get(claimRoot))
        .filter(_.getFileName.toString == "00001.json.claim")
        .findFirst().get()
      java.nio.file.Files.write(claim,
        Array.empty[Byte],
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)

      // the empty claim is not publishable: pending skips it AND, past the
      // grace period, deletes it so the version can be re-claimed instead
      // of staying wedged for every writer
      assert(coord.pending("t1").isEmpty)
      assert(!java.nio.file.Files.exists(claim), "empty claim not reclaimed")
      assert(coord.prepareCommit("t1", "00001.json", "/staged/z"),
        "the version must be claimable again after reclaim")
      assert(coord.pending("t1") == Seq(("00001.json", "/staged/z")))

      // a YOUNG empty claim (inside the grace window) is skipped but kept:
      // its creator may still be alive mid-crash-recovery
      val coord2 = new storage.FileClaimCommitCoordinator(s"$root/claims2")
      assert(coord2.prepareCommit("t1", "00002.json", "/staged/a"))
      val claim2 = java.nio.file.Files.walk(
          java.nio.file.Paths.get(s"$root/claims2"))
        .filter(_.getFileName.toString == "00002.json.claim")
        .findFirst().get()
      java.nio.file.Files.write(claim2, Array.empty[Byte],
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      assert(coord2.pending("t1").isEmpty)
      assert(java.nio.file.Files.exists(claim2),
        "a claim inside the grace window must not be reclaimed")
      assert(!coord2.prepareCommit("t1", "00002.json", "/staged/b"))
    }
  }

  test("FileClaimCommitCoordinator: a .stage file orphaned by a crash " +
      "mid-prepareCommit is swept by pending() past the grace window; a " +
      "young one is left for its live owner (ADVICE r13)") {
    withTempDir { root =>
      // grace 0 = old immediately; the orphan shape: a JVM that died
      // between writing the stage and the createLink publish (the
      // in-process finally never ran)
      val coord = new storage.FileClaimCommitCoordinator(s"$root/claims", 0L)
      assert(coord.prepareCommit("t1", "00001.json", "/staged/x"))
      val dirKey = java.nio.file.Files.list(
          java.nio.file.Paths.get(s"$root/claims"))
        .findFirst().get()
      val orphan = dirKey.resolve(".00002.json.deadbeef.stage")
      java.nio.file.Files.write(orphan, "/staged/dead".getBytes("UTF-8"))
      assert(coord.pending("t1") == Seq(("00001.json", "/staged/x")),
        "the sweep must not disturb live claims")
      assert(!java.nio.file.Files.exists(orphan),
        "a grace-old orphaned .stage must be swept")

      // inside the grace window the stage may belong to a LIVE
      // prepareCommit about to createLink from it — deleting it would
      // fail that writer mid-call
      val coord2 = new storage.FileClaimCommitCoordinator(
        s"$root/claims2", 60000L)
      assert(coord2.prepareCommit("t1", "00001.json", "/staged/x"))
      val dirKey2 = java.nio.file.Files.list(
          java.nio.file.Paths.get(s"$root/claims2"))
        .findFirst().get()
      val young = dirKey2.resolve(".00002.json.cafe.stage")
      java.nio.file.Files.write(young, "/staged/live".getBytes("UTF-8"))
      coord2.pending("t1")
      assert(java.nio.file.Files.exists(young),
        "a stage inside the grace window must not be swept")
    }
  }
}
