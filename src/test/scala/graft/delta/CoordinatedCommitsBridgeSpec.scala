package graft.delta

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.delta.storage.{CommitCoordinator, InMemoryCommitCoordinator}

/** The coordinatedCommits table-property bridge: a table declaring
  * `delta.coordinatedCommits.commitCoordinator` routes commit writes
  * through the CoordinatedLogStore seam with the named registered
  * coordinator, auto-declares the writer feature, and — for an UNKNOWN
  * coordinator name — keeps reading (coordinated commits are backfilled
  * for plain readers) while refusing writes loudly by name. */
class CoordinatedCommitsBridgeSpec extends SparkSpec {
  import spark.implicits._

  /** Counts claims so routing is observable. */
  private class CountingCoordinator extends CommitCoordinator {
    val inner = new InMemoryCommitCoordinator
    val claims = new AtomicInteger(0)
    override def prepareCommit(dir: String, name: String,
                               tempPath: String): Boolean = {
      claims.incrementAndGet()
      inner.prepareCommit(dir, name, tempPath)
    }
    override def commitComplete(dir: String, name: String): Unit =
      inner.commitComplete(dir, name)
    override def pending(dir: String): Seq[(String, String)] =
      inner.pending(dir)
  }

  test("declaring a registered coordinator routes commits and declares the feature") {
    withTempDir { dir =>
      val coord = new CountingCoordinator
      CommitCoordinator.register("spec-coordinator", coord)
      DeltaTable.write(Seq((1L, "a")).toDF("id", "v"), dir)
      val log = DeltaLog.forTable(spark, dir)
      // enable through the delta-spark table property (preview spelling)
      val txn = log.startTransaction()
      val m = txn.snapshot.metadata
      txn.updateMetadata(m.copy(configuration = m.configuration +
        ("delta.coordinatedCommits.commitCoordinator-preview" ->
          "spec-coordinator")))
      txn.commit(Nil, "SET TBLPROPERTIES")
      val p = log.update().protocol
      assert(p.minWriterVersion == 7 &&
        p.writerFeatures.exists(_.contains("coordinatedCommits")),
        s"feature must auto-declare, got $p")
      // the enablement commit used the old store; the NEXT commit claims
      // through the named coordinator
      assert(coord.claims.get() == 0)
      DeltaTable.write(Seq((2L, "b")).toDF("id", "v"), dir)
      assert(coord.claims.get() >= 1,
        s"commit after enablement must claim through the coordinator")
      // reads see everything
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 2)
    }
  }

  test("unknown coordinator: reads work, writes refuse by name") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
      val log = DeltaLog.forTable(spark, dir)
      // foreign-shaped enablement: protocol + property written directly,
      // naming a coordinator this process has not registered
      val m = log.update().metadata
      val newM = m.copy(configuration = m.configuration +
        ("delta.coordinatedCommits.commitCoordinator-preview" ->
          "dynamodb-prod"))
      val p = Protocol(1, 7, writerFeatures = Some(Seq(
        "appendOnly", "invariants", "coordinatedCommits")))
      log.store.write(FileNames.deltaFile(log.logPath, 1),
        Iterator(JsonCodec.toJson(p: Action), JsonCodec.toJson(newM: Action)),
        overwrite = false, log.hadoopConf)
      DeltaLog.clearCache()
      // reads: backfilled commits are in the log, plain readers proceed
      val tbl = DeltaTable.forPath(spark, dir)
      assert(tbl.toDF.count() == 2)
      assert(tbl.toDF.filter(col("v") === "a").count() == 1)
      // writes: refused loudly, naming the coordinator
      val e = intercept[UnsupportedOperationException] {
        DeltaTable.write(Seq((3L, "c")).toDF("id", "v"), dir)
      }
      assert(e.getMessage.contains("dynamodb-prod"))
    }
  }

  test("two racing writers through one coordinator both land") {
    withTempDir { dir =>
      CommitCoordinator.register("race-coordinator",
        new InMemoryCommitCoordinator)
      DeltaTable.write(Seq((0L, "seed")).toDF("id", "v"), dir,
        configuration = Map(
          "delta.coordinatedCommits.commitCoordinator" -> "race-coordinator"))
      val threads = (1 to 4).map { t =>
        new Thread(() => {
          DeltaTable.write(Seq((t.toLong, s"w$t")).toDF("id", "v"), dir)
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val rows = DeltaTable.forPath(spark, dir).toDF
        .select(col("id")).as[Long].collect().toSet
      assert(rows == Set(0L, 1L, 2L, 3L, 4L))
    }
  }
}
