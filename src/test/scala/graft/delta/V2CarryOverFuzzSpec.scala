package graft.delta

import java.io.File

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized-sequence insurance for the V2 sidecar carry-over: a v2
  * table and a PLAIN twin receive the same op sequence (appends,
  * rewriting deletes, OPTIMIZE, metadata changes); every few steps the
  * v2 table checkpoints, its subsumed commits are DELETED so the next
  * read can only reconstruct through the (carried) checkpoint, and the
  * two tables' full contents must match exactly. Fixed seed — failures
  * replay. The metadata-change op exercises the forced-full-rewrite
  * path; deletes exercise changed-bucket rewrites + tombstone sidecars;
  * OPTIMIZE exercises whole-bucket churn. */
class V2CarryOverFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def dropSubsumed(dir: String): Unit = {
    val logDir = new File(dir, "_delta_log")
    val cps = logDir.listFiles()
      .filter(f => FileNames.isV2CheckpointFile(new Path(f.getName)))
      .map(f => FileNames.checkpointVersion(new Path(f.getName)))
    if (cps.isEmpty) return
    (0L to cps.max).foreach(v => new File(logDir, f"$v%020d.json").delete())
    DeltaLog.clearCache()
  }

  private def ids(dir: String): Seq[Long] =
    DeltaTable.forPath(spark, dir).toDF.select($"id").as[Long]
      .collect().sorted.toSeq

  test("randomized ops: replay through carried checkpoints equals a " +
      "plain twin (seeded)") {
    val rnd = new scala.util.Random(20260815L)
    withTempDir { a =>
      withTempDir { b =>
        var nextId = 0L
        def freshRows(n: Int): Seq[Long] = {
          val r = nextId until nextId + n
          nextId += n
          r
        }
        val seed = freshRows(60)
        DeltaTable.write(seed.toDF("id").repartitionByRange(4, $"id"), a,
          configuration = Map(
            "delta.checkpointPolicy" -> "v2",
            "delta.checkpointParts" -> "4",
            "delta.checkpointInterval" -> "1000")) // manual checkpoints
        DeltaTable.write(seed.toDF("id").repartitionByRange(4, $"id"), b)

        var checkpoints = 0
        for (step <- 1 to 24) {
          rnd.nextInt(10) match {
            case n if n <= 4 => // append (the common op)
              val rows = freshRows(rnd.nextInt(15) + 1)
              DeltaTable.write(rows.toDF("id").coalesce(1), a)
              DeltaTable.write(rows.toDF("id").coalesce(1), b)
            case 5 | 6 => // rewriting delete of a random id range
              val lo = rnd.nextLong().abs % math.max(nextId, 1L)
              val hi = lo + rnd.nextInt(25) + 1
              DeltaTable.forPath(spark, a)
                .delete($"id" >= lo && $"id" < hi)
              DeltaTable.forPath(spark, b)
                .delete($"id" >= lo && $"id" < hi)
            case 7 => // bin-packing rewrite
              DeltaTable.forPath(spark, a).compact()
              DeltaTable.forPath(spark, b).compact()
            case _ => // metadata change: forces the full-rewrite path
              DeltaTable.forPath(spark, a)
                .setProperties(Map("graft.fuzz.step" -> step.toString))
              DeltaTable.forPath(spark, b)
                .setProperties(Map("graft.fuzz.step" -> step.toString))
          }
          if (step % 3 == 0) {
            Checkpoints.writeCheckpoint(
              DeltaLog.forTable(spark, a).update(), parts = 4)
            checkpoints += 1
            // force the read THROUGH the checkpoint: the subsumed
            // commits no longer exist
            dropSubsumed(a)
            assert(ids(a) == ids(b), s"diverged at step $step")
          }
        }
        assert(checkpoints >= 8, "the sequence must exercise checkpoints")
        assert(ids(a).nonEmpty)
      }
    }
  }

  test("randomized ops under DELETION-VECTOR shading: carried checkpoints " +
      "must replay shades exactly (seeded)") {
    // the v2 table shades deletes (remove(path,'') + add(path,dv) SAME
    // path -> the bucket rewrites); the twin rewrites plainly — equal
    // contents prove carry-over composes with merge-on-read DML
    val rnd = new scala.util.Random(9042026L)
    withTempDir { a =>
      withTempDir { b =>
        var nextId = 0L
        def freshRows(n: Int): Seq[Long] = {
          val r = nextId until nextId + n
          nextId += n
          r
        }
        val seed = freshRows(80)
        DeltaTable.write(seed.toDF("id").repartitionByRange(4, $"id"), a,
          configuration = Map(
            "delta.checkpointPolicy" -> "v2",
            "delta.checkpointParts" -> "4",
            "delta.checkpointInterval" -> "1000",
            "delta.enableDeletionVectors" -> "true"))
        DeltaTable.write(seed.toDF("id").repartitionByRange(4, $"id"), b)

        for (step <- 1 to 18) {
          rnd.nextInt(8) match {
            case n if n <= 3 =>
              val rows = freshRows(rnd.nextInt(12) + 1)
              DeltaTable.write(rows.toDF("id").coalesce(1), a)
              DeltaTable.write(rows.toDF("id").coalesce(1), b)
            case 4 | 5 | 6 => // shading delete on a, plain rewrite on b
              val lo = rnd.nextLong().abs % math.max(nextId, 1L)
              val hi = lo + rnd.nextInt(20) + 1
              DeltaTable.forPath(spark, a)
                .delete($"id" >= lo && $"id" < hi)
              DeltaTable.forPath(spark, b)
                .delete($"id" >= lo && $"id" < hi)
            case _ => // purge shades / bin-pack
              DeltaTable.forPath(spark, a).compact()
              DeltaTable.forPath(spark, b).compact()
          }
          if (step % 3 == 0) {
            Checkpoints.writeCheckpoint(
              DeltaLog.forTable(spark, a).update(), parts = 4)
            dropSubsumed(a)
            assert(ids(a) == ids(b), s"DV fuzz diverged at step $step")
          }
        }
        assert(ids(a).nonEmpty)
      }
    }
  }
}
