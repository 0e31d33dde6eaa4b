package graft.delta

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized-sequence insurance for log compaction: a table receives a
  * random DML history (appends, rewriting deletes, updates, OPTIMIZE,
  * property changes, setTxn-carrying writes); random contiguous ranges
  * are compacted via [[DeltaLog.compactLog]], their ORIGINAL commits
  * deleted, and after every step the replayed state must equal a PLAIN
  * twin that received the identical ops and keeps its full log. Both
  * the driver fold and the distributed fold are exercised. Fixed seed —
  * failures replay. */
class LogCompactionFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def rows(dir: String): Set[(Long, Long)] =
    DeltaTable.forPath(spark, dir).toDF
      .select($"id", $"grp").as[(Long, Long)].collect().toSet

  test("randomized ops + random compacted ranges (originals deleted) " +
      "equal a plain twin (seeded)") {
    val rnd = new scala.util.Random(20260815L)
    withTempDir { a =>
      withTempDir { b =>
        var nextId = 0L
        def freshRows(n: Int): Seq[(Long, Long)] = {
          val r = (nextId until nextId + n).map(i => (i, i % 3))
          nextId += n
          r
        }
        def both(f: String => Unit): Unit = { f(a); f(b) }
        val seed = freshRows(40)
        both(d => DeltaTable.write(seed.toDF("id", "grp"), d,
          configuration = Map("delta.checkpointInterval" -> "1000")))

        // versions already consumed by a compacted range in `a` (their
        // json is gone; never compact across them again)
        var compactedThrough = 0L
        for (step <- 1 to 30) {
          rnd.nextInt(12) match {
            case n if n <= 5 =>
              val fresh = freshRows(rnd.nextInt(12) + 1)
              both(d => DeltaTable.write(fresh.toDF("id", "grp"), d))
            case 6 | 7 =>
              val cut = rnd.nextLong(math.max(nextId, 1L))
              both(d => DeltaTable.forPath(spark, d)
                .delete($"id" === cut || $"id" === cut + 7))
            case 8 =>
              val cut = rnd.nextLong(math.max(nextId, 1L))
              both(d => DeltaTable.forPath(spark, d)
                .update($"id" === cut, Map("grp" -> lit(99L))))
            case 9 =>
              both(d => DeltaTable.forPath(spark, d).compact())
            case 10 =>
              val k = s"fuzz.step"
              both(d => DeltaTable.forPath(spark, d)
                .setProperties(Map(k -> step.toString)))
            case _ =>
              val fresh = freshRows(3)
              both(d => DeltaTable.write(fresh.toDF("id", "grp"), d,
                idempotentTxn = Some((s"fuzz-app", step.toLong))))
          }

          // occasionally compact a random still-plain range in `a` and
          // burn the originals
          val logA = DeltaLog.forTable(spark, a)
          val head = logA.update().version
          if (rnd.nextInt(3) == 0 && head - compactedThrough >= 2) {
            val start = compactedThrough + 1
            val len = 2 + rnd.nextInt((head - start).toInt.min(4))
            val end = math.min(start + len - 1, head)
            logA.compactLog(start, end)
            (start to end).foreach { v =>
              assert(new File(
                FileNames.deltaFile(logA.logPath, v).toUri.getPath).delete(),
                s"commit $v must exist before deletion")
            }
            compactedThrough = end
            DeltaLog.clearCache()
          }

          assert(rows(a) == rows(b), s"state diverged at step $step")
        }
        // final checks: distributed fold over the compacted log, and the
        // non-file state survived (properties, txn versions)
        DeltaLog.clearCache()
        spark.conf.set(Snapshot.DriverStateMaxBytesKey, "0")
        try assert(rows(a) == rows(b), "distributed fold diverged")
        finally spark.conf.unset(Snapshot.DriverStateMaxBytesKey)
        DeltaLog.clearCache()
        val (sa, sb) = (DeltaLog.forTable(spark, a).update(),
          DeltaLog.forTable(spark, b).update())
        assert(sa.metadata.configuration.get("fuzz.step") ==
          sb.metadata.configuration.get("fuzz.step"))
        assert(sa.setTransactions.find(_.appId == "fuzz-app").map(_.version) ==
          sb.setTransactions.find(_.appId == "fuzz-app").map(_.version))
      }
    }
  }
}
