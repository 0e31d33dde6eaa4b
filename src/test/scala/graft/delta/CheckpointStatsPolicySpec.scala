package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.delta.read.DataSkipping

/** `delta.checkpoint.writeStatsAsStruct` / `writeStatsAsJson`: which
  * stats form checkpointed AddFiles carry. At 100 TB the stats are the
  * bulk of checkpoint bytes; dropping the JSON duplicate halves them
  * while pruning keeps running from the struct. */
class CheckpointStatsPolicySpec extends SparkSpec {
  import spark.implicits._

  private def checkpointed(dir: String,
                           props: Map[String, String]): Seq[AddFile] = {
    DeltaTable.write((1L to 400L).toDF("id")
      .withColumn("k", $"id" % 4).repartition(4, $"k"),
      dir, configuration = props)
    val log = DeltaLog.forTable(spark, dir)
    Checkpoints.writeCheckpoint(log.update())
    // force one empty commit so replay STARTS from the checkpoint
    log.startTransaction().commit(Nil, DeltaOperations.ManualUpdate)
    DeltaLog.clearCache()
    DeltaLog.forTable(spark, dir).update().allFiles
  }

  test("default: both JSON and struct stats ride the checkpoint") {
    withTempDir { dir =>
      val files = checkpointed(dir, Map.empty)
      assert(files.nonEmpty)
      assert(files.forall(f => f.stats.isDefined && f.stats_parsed.isDefined))
    }
  }

  test("writeStatsAsJson=false drops the JSON; pruning runs struct-only") {
    withTempDir { dir =>
      val files = checkpointed(dir,
        Map("delta.checkpoint.writeStatsAsJson" -> "false"))
      assert(files.forall(f => f.stats.isEmpty && f.stats_parsed.isDefined))

      // a selective filter still prunes, and does so WITHOUT a single
      // Jackson walk of raw stats JSON (there is none to walk)
      val before = DataSkipping.statsJsonParses.get()
      val n = DeltaTable.forPath(spark, dir).toDF
        .filter($"id" === 7L).count()
      assert(n == 1)
      assert(DataSkipping.statsJsonParses.get() == before,
        "struct-only checkpoint must not re-parse stats JSON")

      // the metadata-only aggregate path still answers from the struct
      DeltaTable.forPath(spark, dir).toDF.createOrReplaceTempView("cp_t")
      assert(spark.sql("SELECT COUNT(*) FROM cp_t").as[Long].head == 400L)
    }
  }

  test("writeStatsAsStruct=false keeps JSON only") {
    withTempDir { dir =>
      val files = checkpointed(dir,
        Map("delta.checkpoint.writeStatsAsStruct" -> "false"))
      assert(files.forall(f => f.stats.isDefined && f.stats_parsed.isEmpty))
      // pruning still works (parses the JSON as pre-struct tables always did)
      assert(DeltaTable.forPath(spark, dir).toDF
        .filter($"id" === 7L).count() == 1)
    }
  }

  test("both off: stats gone after checkpoint, queries fall back to scans") {
    withTempDir { dir =>
      val files = checkpointed(dir,
        Map("delta.checkpoint.writeStatsAsStruct" -> "false",
            "delta.checkpoint.writeStatsAsJson" -> "false"))
      assert(files.forall(f => f.stats.isEmpty && f.stats_parsed.isEmpty))
      // correctness holds — the answers come from real scans now
      val df = DeltaTable.forPath(spark, dir).toDF
      assert(df.filter($"id" === 7L).count() == 1)
      assert(df.count() == 400L)
    }
  }
}
