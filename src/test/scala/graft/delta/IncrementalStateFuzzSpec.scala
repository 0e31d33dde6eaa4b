package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-feature insurance for the INCREMENTAL snapshot machinery: a
  * randomized op sequence (appends, shading deletes, updates, OPTIMIZE,
  * property changes, RESTORE) runs against one cached DeltaLog whose
  * snapshots seed each other fold-to-fold; at checkpoints of the
  * sequence the seeded state is fingerprinted against a CACHE-CLEARED
  * fresh replay of the same version. Any divergence — a fold that
  * drops/duplicates a file, a tombstone that leaks, a domain or txn
  * that doesn't carry — fails with the step number for seeded replay.
  * DV shading + row tracking are ON so the richest action shapes
  * (same-version remove+add pairs, domain hwm ratchets, baseRowId
  * assignment) flow through the seeded folds. Fixed seed. */
class IncrementalStateFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def fingerprint(s: Snapshot) = (
    s.version,
    s.allFiles.map(a => (a.path, a.dvId, a.size, a.baseRowId,
      a.deletionVector.map(_.cardinality))).toSet,
    s.tombstones.map(r => (r.path, r.dvId)).toSet,
    s.metadata.configuration,
    s.protocol,
    s.setTransactions.toSet,
    s.domainActions.map(d => (d.domain, d.configuration, d.removed)).toSet)

  test("seeded incremental snapshots equal fresh replays under random " +
      "op sequences (seeded)") {
    val rnd = new scala.util.Random(271828L)
    withTempDir { dir =>
      var nextId = 0L
      def freshRows(n: Int): Seq[Long] = {
        val r = nextId until nextId + n; nextId += n; r
      }
      DeltaTable.write(
        freshRows(60).map(i => (i, i * 2)).toDF("id", "v")
          .repartitionByRange(3, $"id"),
        dir,
        configuration = Map(
          "delta.checkpointInterval" -> "5", // interval checkpoints fire
          "delta.enableDeletionVectors" -> "true",
          "delta.enableRowTracking" -> "true"))
      for (step <- 1 to 30) {
        rnd.nextInt(12) match {
          case n if n <= 4 =>
            DeltaTable.write(
              freshRows(rnd.nextInt(10) + 1).map(i => (i, i * 2))
                .toDF("id", "v").coalesce(1), dir)
          case 5 | 6 => // shading delete
            val lo = rnd.nextLong().abs % math.max(nextId, 1L)
            DeltaTable.forPath(spark, dir)
              .delete($"id" >= lo && $"id" < lo + rnd.nextInt(15) + 1)
          case 7 => // rewriting update
            val k = rnd.nextLong().abs % math.max(nextId, 1L)
            DeltaTable.forPath(spark, dir)
              .update($"id" === k, Map("v" -> lit(-1L)))
          case 8 => DeltaTable.forPath(spark, dir).compact()
          case 9 =>
            DeltaTable.forPath(spark, dir)
              .setProperties(Map("graft.fuzz.step" -> step.toString))
          case 10 => // idempotent-writer marker rides the txn fold
            DeltaTable.write(
              freshRows(2).map(i => (i, i * 2)).toDF("id", "v").coalesce(1),
              dir, idempotentTxn = Some(("state-fuzz", step.toLong)))
          case _ => // restore two versions back (feature re-declares,
            // un-shading, file resurrection all fold through)
            val v = DeltaLog.forTable(spark, dir).update().version
            if (v >= 2) DeltaTable.forPath(spark, dir).restore(v - 2)
        }
        if (step % 5 == 0) {
          val seeded = fingerprint(DeltaLog.forTable(spark, dir).update())
          DeltaLog.clearCache()
          val fresh = fingerprint(DeltaLog.forTable(spark, dir).update())
          assert(seeded == fresh, s"state diverged at step $step")
        }
      }
      assert(nextId > 60, "the sequence must have appended")
    }
  }
}
