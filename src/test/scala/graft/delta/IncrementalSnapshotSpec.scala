package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental snapshot updates: when a segment EXTENDS the superseded
  * snapshot (same checkpoint), the new snapshot seeds its fold from the
  * old one's already-computed state and replays only the new commits —
  * a commit loop costs O(1) log I/O per commit instead of re-reading the
  * checkpoint parquet (a Spark job) and re-parsing the whole commit tail
  * every time. Equality against a FRESH fold is the contract; `seededFrom`
  * is the observability hook proving the fast path actually ran. */
class IncrementalSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def freshState(dir: String): (Seq[(String, Long)], Map[String, String]) = {
    DeltaLog.clearCache()
    val s = DeltaLog.forTable(spark, dir).update()
    (s.allFiles.map(f => (f.path, f.size)).sortBy(_._1),
      s.metadata.configuration)
  }

  test("commit loop folds incrementally and matches fresh folds across checkpoints") {
    withTempDir { dir =>
      DeltaTable.write(Seq(1, 2, 3).toDF("v"), dir,
        configuration = Map("delta.checkpointInterval" -> "3"))
      val log = DeltaLog.forTable(spark, dir)
      var prevVersion = log.update().version
      log.update().allFiles // force the fold so the successor can seed
      (1 to 7).foreach { i =>
        DeltaTable.write(Seq(10 * i).toDF("v"), dir)
        val snap = log.update()
        val incremental = snap.allFiles.map(f => (f.path, f.size)).sortBy(_._1)
        val crossedCheckpoint =
          snap.logSegment.checkpointVersion.exists(_ > prevVersion)
        if (crossedCheckpoint) {
          assert(snap.seededFrom.isEmpty,
            s"checkpoint advanced past v$prevVersion: fold must restart " +
              s"from the checkpoint, got ${snap.seededFrom}")
        } else {
          assert(snap.seededFrom.contains(prevVersion),
            s"extension of v$prevVersion must seed from it, " +
              s"got ${snap.seededFrom}")
        }
        assert((incremental, snap.metadata.configuration) == freshState(dir),
          s"incremental state diverged from fresh fold at version ${snap.version}")
        // freshState cleared the cache; re-register OUR log for next round
        DeltaLog.clearCache()
        prevVersion = DeltaLog.forTable(spark, dir).update().version
      }
    }
  }

  test("incremental fold handles removes and DV updates like a fresh fold") {
    withTempDir { dir =>
      import graft.delta.dv.{DeletionVectors, RoaringBitmapArray}
      DeltaTable.write((0 until 10).map(_.toLong).toDF("id")
        .repartition(1).sortWithinPartitions("id"), dir)
      DeltaTable.write(Seq(100L).toDF("id"), dir)
      val log = DeltaLog.forTable(spark, dir)
      val snap0 = log.update()
      snap0.allFiles // computed fold to seed from
      // delete-style commit: remove the SECOND (1-row) file — identified
      // by size, never by path: batch dirs are uuid-named, so path order
      // between the two files is a coin flip
      val victim = snap0.allFiles.minBy(_.size)
      log.store.write(FileNames.deltaFile(log.logPath, snap0.version + 1),
        Seq(victim.remove(dataChange = true): Action)
          .map(JsonCodec.toJson).iterator, overwrite = false, log.hadoopConf)
      val snap1 = log.update()
      assert(snap1.allFiles.map(_.path).sorted ==
        snap0.allFiles.map(_.path).filterNot(_ == victim.path).sorted)
      assert(snap1.seededFrom.contains(snap0.version))

      // DV attach as one commit (add with dv THEN remove of the same
      // path): (path, dvId) keying must hold through the seeded fold too
      val target = snap1.allFiles.head
      val dv = DeletionVectors.inline(RoaringBitmapArray(2L, 5L))
      val actions: Seq[Action] = Seq(
        Protocol(minReaderVersion = 3, minWriterVersion = 7,
          readerFeatures = Some(Seq("deletionVectors")),
          writerFeatures = Some(Seq("deletionVectors"))),
        target.copy(deletionVector = Some(dv), dataChange = true),
        target.remove(dataChange = true))
      log.store.write(FileNames.deltaFile(log.logPath, snap1.version + 1),
        actions.map(JsonCodec.toJson).iterator, overwrite = false,
        log.hadoopConf)
      val snap2 = log.update()
      assert(snap2.allFiles.length == 1 &&
        snap2.allFiles.head.deletionVector.contains(dv))
      assert(snap2.seededFrom.contains(snap1.version))
      val got = DeltaTable.forPath(spark, dir).toDF
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == Seq(0L, 1L, 3L, 4L, 6L, 7L, 8L, 9L))
      // and the seeded state agrees byte-for-byte with a fresh fold
      assert(snap2.allFiles.map(f => (f.path, f.dvId)).sorted ==
        { DeltaLog.clearCache()
          DeltaLog.forTable(spark, dir).update()
            .allFiles.map(f => (f.path, f.dvId)).sorted })
    }
  }

  test("metadata-only updates seed the light fold without touching file state") {
    withTempDir { dir =>
      DeltaTable.write(Seq(1, 2).toDF("v"), dir)
      val log = DeltaLog.forTable(spark, dir)
      val s0 = log.update()
      s0.metadata // light fold only
      assert(!s0.fullStateComputed)
      DeltaTable.write(Seq(3).toDF("v"), dir)
      val s1 = log.update()
      assert(s1.metadata.schema.fieldNames.sameElements(Array("v")))
      assert(s1.seededFrom.contains(s0.version),
        s"light fold must seed incrementally, got ${s1.seededFrom}")
      assert(!s1.fullStateComputed,
        "seeding the light fold must not force the file-state fold")
    }
  }
}
