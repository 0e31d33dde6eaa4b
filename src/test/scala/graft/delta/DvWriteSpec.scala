package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Merge-on-read DELETE via deletion vectors
  * (`delta.enableDeletionVectors`): a delete shades files with position
  * bitmaps instead of rewriting them; every other path — scans, DML
  * rewrites, OPTIMIZE purge, restore, vacuum, CDF — must see exactly the
  * live rows. The twin-table pattern (same operations against a
  * rewrite-mode table) pins the semantics: shading is an EXECUTION
  * strategy, never an answer change. */
class DvWriteSpec extends SparkSpec {
  import spark.implicits._

  private val dvConf = Map("delta.enableDeletionVectors" -> "true")

  private def ids(dir: String): Seq[Long] =
    DeltaTable.forPath(spark, dir).toDF
      .select("id").as[Long].collect().sorted.toSeq

  test("delete shades instead of rewriting; protocol upgrades once; shades merge") {
    withTempDir { dir =>
      DeltaTable.write((0L until 20L).toDF("id"), dir, configuration = dvConf)
      val log = DeltaLog.forTable(spark, dir)
      val before = log.update().allFiles.map(_.path).toSet

      val t = DeltaTable.forPath(spark, dir)
      t.delete($"id" % 5 === 2)
      assert(ids(dir) == (0L until 20L).filter(_ % 5 != 2))
      val snap1 = log.update()
      // the DATA FILES did not move — same paths, now shaded
      assert(snap1.allFiles.map(_.path).toSet == before)
      assert(snap1.allFiles.forall(_.deletionVector.isDefined))
      assert(snap1.dvCardinality == 4L)
      // protocol upgraded to (3,7) with the feature, legacy writer-2
      // capabilities preserved
      val p = snap1.protocol
      assert(p.minReaderVersion == 3 && p.minWriterVersion == 7)
      assert(p.readerFeatures.get.contains("deletionVectors"))
      assert(p.writerFeatures.get.contains("deletionVectors"))
      assert(p.writerFeatures.get.contains("appendOnly"))

      // second delete MERGES into the shade (old bitmap unioned)
      t.delete($"id" === 0L || $"id" === 11L)
      assert(ids(dir) == (0L until 20L)
        .filter(i => i % 5 != 2 && i != 0L && i != 11L))
      val snap2 = log.update()
      assert(snap2.allFiles.map(_.path).toSet == before)
      assert(snap2.dvCardinality == 6L)
      // history records the shading metrics
      val h = t.history().filter(col("operation") === "DELETE")
        .select("operationMetrics").as[Map[String, String]].collect()
      assert(h.exists(_.get("numDeletionVectorsAdded").exists(_.toInt > 0)))
    }
  }

  test("a fully-deleted file is dropped outright, not shaded") {
    withTempDir { dir =>
      DeltaTable.write((0L until 10L).toDF("id").repartition(1), dir,
        configuration = dvConf)
      DeltaTable.write((100L until 110L).toDF("id").repartition(1), dir)
      val t = DeltaTable.forPath(spark, dir)
      t.delete($"id" < 50L) // wipes the first file completely
      val snap = DeltaLog.forTable(spark, dir).update()
      assert(snap.allFiles.length == 1, "the wiped file must be REMOVED")
      assert(snap.allFiles.head.deletionVector.isEmpty)
      assert(ids(dir) == (100L until 110L))
    }
  }

  test("twin-table equivalence: shading answers match rewriting across DML") {
    withTempDir { shadedDir => withTempDir { rewriteDir =>
      val data = (0L until 50L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
      DeltaTable.write(data, shadedDir, configuration = dvConf)
      DeltaTable.write(data, rewriteDir)
      val s = DeltaTable.forPath(spark, shadedDir)
      val r = DeltaTable.forPath(spark, rewriteDir)
      def both(f: DeltaTable => Unit): Unit = { f(s); f(r) }
      both(_.delete($"id" % 7 === 1))
      // UPDATE on the shaded table rewrites through the shade (live rows
      // only) — deleted rows must not resurrect, updates must apply
      both(_.update($"id" % 10 === 4, Map("g" -> lit("updated"))))
      both(_.delete($"g" === "g2" && $"id" > 30L))
      val left = s.toDF.select("id", "g").as[(Long, String)]
        .collect().sorted.toSeq
      val right = r.toDF.select("id", "g").as[(Long, String)]
        .collect().sorted.toSeq
      assert(left == right)
      assert(left.nonEmpty)
    }}
  }

  test("OPTIMIZE purges shades; vacuum then reclaims the bin; reads hold") {
    withTempDir { dir =>
      DeltaTable.write((0L until 30L).toDF("id"), dir, configuration = dvConf)
      val t = DeltaTable.forPath(spark, dir)
      t.delete($"id" % 3 === 0)
      val expected = (0L until 30L).filter(_ % 3 != 0)
      assert(ids(dir) == expected)
      val log = DeltaLog.forTable(spark, dir)
      val binDir = new java.io.File(dir)
      def bins() = binDir.listFiles()
        .filter(_.getName.startsWith("deletion_vector_")).toSeq
      assert(bins().nonEmpty, "the shade must live in an on-disk bin")

      // vacuum while the shade is ACTIVE: the bin must survive
      spark.conf.set("spark.graft.vacuum.retentionCheck.enabled", "false")
      try {
        t.vacuum(retentionMillis = Some(0L))
        assert(bins().nonEmpty, "vacuum deleted a LIVE deletion vector")
        assert(ids(dir) == expected)

        // OPTIMIZE rewrites the shaded file to plain parquet
        t.compact()
        val snap = log.update()
        assert(snap.allFiles.forall(_.deletionVector.isEmpty),
          "compaction must purge descriptors")
        assert(snap.dvCardinality == 0L)
        assert(ids(dir) == expected)

        // now the bin is garbage — vacuum reclaims it
        t.vacuum(retentionMillis = Some(0L))
        assert(bins().isEmpty, "purged bin must be reclaimable")
        assert(ids(dir) == expected)
      } finally {
        spark.conf.unset("spark.graft.vacuum.retentionCheck.enabled")
      }
    }
  }

  test("restore across a shade un-deletes; time travel sees both sides") {
    withTempDir { dir =>
      DeltaTable.write((0L until 12L).toDF("id"), dir, configuration = dvConf)
      val t = DeltaTable.forPath(spark, dir)
      t.delete($"id" >= 8L)
      assert(ids(dir) == (0L until 8L))
      assert(t.asOfVersion(0).select("id").as[Long].collect().sorted.toSeq
        == (0L until 12L))
      t.restore(0)
      assert(ids(dir) == (0L until 12L),
        "restore must swap (path, dv) back to (path, none)")
    }
  }

  test("CDF records DV deletes as delete rows") {
    withTempDir { dir =>
      DeltaTable.write((0L until 10L).toDF("id"), dir,
        configuration = dvConf + ("delta.enableChangeDataFeed" -> "true"))
      val t = DeltaTable.forPath(spark, dir)
      t.delete($"id" % 4 === 1)
      val changes = t.changes(1, 1)
        .filter(col("_change_type") === "delete")
        .select("id").as[Long].collect().sorted.toSeq
      assert(changes == Seq(1L, 5L, 9L))
    }
  }

  test("shallow clone of a shaded table rebases descriptors and reads true") {
    withTempDir { src => withTempDir { dstParent =>
      val dst = s"$dstParent/clone"
      DeltaTable.write((0L until 10L).toDF("id"), src, configuration = dvConf)
      val t = DeltaTable.forPath(spark, src)
      t.delete($"id" === 3L || $"id" === 7L)
      t.cloneTo(dst)
      val cloned = DeltaTable.forPath(spark, dst).toDF
        .select("id").as[Long].collect().sorted.toSeq
      assert(cloned == Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L))
      val dvs = DeltaLog.forTable(spark, dst).update()
        .allFiles.flatMap(_.deletionVector)
      assert(dvs.nonEmpty && dvs.forall(_.storageType == "p"),
        s"clone must rebase relative shades to absolute paths: $dvs")
    }}
  }

  test("update shades the old rows and writes only the updated ones") {
    withTempDir { dir =>
      val data = (0L until 40L).map(i => (i, i * 10L)).toDF("id", "v")
      DeltaTable.write(data.repartition(2), dir, configuration = dvConf)
      val log = DeltaLog.forTable(spark, dir)
      val before = log.update().allFiles.map(_.path).toSet
      assert(before.size == 2)

      val t = DeltaTable.forPath(spark, dir)
      t.update($"id" % 10 === 3, Map("v" -> lit(-1L)))
      val snap = log.update()
      // the original data files never moved — they are shaded, and the
      // only NEW bytes are the 4 updated rows
      assert(before.subsetOf(snap.allFiles.map(_.path).toSet))
      assert(snap.allFiles.filter(f => before.contains(f.path))
        .forall(_.deletionVector.isDefined))
      val newFiles = snap.allFiles.filterNot(f => before.contains(f.path))
      assert(newFiles.nonEmpty && newFiles.forall(_.deletionVector.isEmpty))
      assert(snap.dvCardinality == 4L)
      val got = t.toDF.select("id", "v").as[(Long, Long)].collect().sorted.toSeq
      assert(got == (0L until 40L).map(i =>
        (i, if (i % 10 == 3) -1L else i * 10L)).sorted)
      // history records the shading metrics
      val h = t.history().filter(col("operation") === "UPDATE")
        .select("operationMetrics").as[Map[String, String]].collect()
      assert(h.exists(_.get("numDeletionVectorsAdded").exists(_.toInt == 2)))
    }
  }

  test("update CDF emits pre/post images; shades merge across updates") {
    withTempDir { dir =>
      DeltaTable.write((0L until 10L).map(i => (i, 0L)).toDF("id", "v"), dir,
        configuration = dvConf + ("delta.enableChangeDataFeed" -> "true"))
      val t = DeltaTable.forPath(spark, dir)
      t.update($"id" === 2L, Map("v" -> lit(20L)))
      t.update($"id" === 2L || $"id" === 3L, Map("v" -> lit(99L)))
      val c1 = t.changes(1, 1).select("_change_type", "id", "v")
        .as[(String, Long, Long)].collect().sorted.toSeq
      assert(c1 == Seq(("update_postimage", 2L, 20L), ("update_preimage", 2L, 0L)))
      val c2 = t.changes(2, 2).select("_change_type", "id", "v")
        .as[(String, Long, Long)].collect().sorted.toSeq
      assert(c2 == Seq(("update_postimage", 2L, 99L), ("update_postimage", 3L, 99L),
        ("update_preimage", 2L, 20L), ("update_preimage", 3L, 0L)))
      assert(t.toDF.filter($"v" === 99L).count() == 2)
    }
  }

  test("update that hits every live row of a file drops it outright") {
    withTempDir { dir =>
      DeltaTable.write((0L until 5L).toDF("id").coalesce(1), dir,
        configuration = dvConf)
      DeltaTable.write((100L until 105L).toDF("id").coalesce(1), dir)
      val t = DeltaTable.forPath(spark, dir)
      t.update($"id" < 50L, Map("id" -> ($"id" + 1000L)))
      val snap = DeltaLog.forTable(spark, dir).update()
      // the fully-hit file is gone (no shade); its rows live in new files
      assert(snap.allFiles.forall(_.deletionVector.isEmpty))
      assert(ids(dir) == ((100L until 105L) ++ (1000L until 1005L)).sorted)
    }
  }

  test("merge shades hit rows; untouched rows never move") {
    withTempDir { dir =>
      val data = (0L until 30L).map(i => (i, 0L)).toDF("id", "v")
      DeltaTable.write(data.repartition(2), dir, configuration = dvConf)
      val log = DeltaLog.forTable(spark, dir)
      val before = log.update().allFiles.map(_.path).toSet

      val t = DeltaTable.forPath(spark, dir)
      val src = Seq((3L, 33L), (7L, 77L), (100L, 1L)).toDF("id", "v")
      t.merge(src, col("t.id") === col("s.id"))
        .whenMatchedUpdate(col("s.id") === 3L, Map("v" -> col("s.v")))
        .whenMatchedDelete()
        .whenNotMatchedInsertAll()
        .execute()
      val snap = log.update()
      // original files shaded in place (2 hits: one update, one delete)
      assert(before.subsetOf(snap.allFiles.map(_.path).toSet))
      assert(snap.dvCardinality == 2L)
      val got = t.toDF.select("id", "v").as[(Long, Long)].collect().sorted.toSeq
      val expected = ((0L until 30L).filter(i => i != 3L && i != 7L)
        .map(i => (i, 0L)) ++ Seq((3L, 33L), (100L, 1L))).sorted
      assert(got == expected)
      val h = t.history().filter(col("operation") === "MERGE")
        .select("operationMetrics").as[Map[String, String]].collect()
      assert(h.exists(_.get("numDeletionVectorsAdded").exists(_.toInt > 0)))
    }
  }

  test("merge with only not-matched-by-source clauses shades too") {
    withTempDir { dir =>
      DeltaTable.write((0L until 10L).map(i => (i, 0L)).toDF("id", "v"), dir,
        configuration = dvConf)
      val t = DeltaTable.forPath(spark, dir)
      // duplicate source keys are legal without matched clauses
      val src = Seq((0L, 0L), (0L, 0L), (1L, 0L), (2L, 0L)).toDF("id", "v")
      t.merge(src, col("t.id") === col("s.id"))
        .whenNotMatchedBySourceDelete(col("t.id") >= 8L)
        .whenNotMatchedBySourceUpdate(Map("v" -> lit(5L)))
        .execute()
      val got = t.toDF.select("id", "v").as[(Long, Long)].collect().sorted.toSeq
      val expected = ((0L to 2L).map(i => (i, 0L)) ++
        (3L to 7L).map(i => (i, 5L))).sorted
      assert(got == expected)
      val snap = DeltaLog.forTable(spark, dir).update()
      assert(snap.allFiles.exists(_.deletionVector.isDefined))
    }
  }

  test("concurrent shading of the same file conflicts (no lost update)") {
    withTempDir { dir =>
      DeltaTable.write((0L until 10L).toDF("id").coalesce(1), dir,
        configuration = dvConf)
      val log = DeltaLog.forTable(spark, dir)
      val txn = log.startTransaction() // pins the unshaded snapshot
      txn.readWholeTable()
      val add = txn.snapshot.allFiles.head

      // winner shades the file first
      DeltaTable.forPath(spark, dir).delete($"id" === 1L)

      // our stale shade (built against the pre-winner bitmap) must NOT
      // commit — it would silently drop the winner's deletion
      val bm = graft.delta.dv.RoaringBitmapArray(5L)
      val desc = graft.delta.dv.DeletionVectors.inline(bm)
      intercept[graft.delta.txn.ConcurrentModificationException] {
        txn.commit(Seq(
          add.copy(deletionVector = Some(desc), dataChange = true),
          add.remove(log.clock())), DeltaOperations.Delete)
      }
    }
  }

  test("DV update that SETs the partition column relocates moved rows") {
    withTempDir { dir =>
      val data = (0L until 20L).map(i => (i, if (i < 10) "a" else "b"))
        .toDF("id", "p")
      DeltaTable.write(data, dir, partitionBy = Seq("p"),
        configuration = dvConf)
      val t = DeltaTable.forPath(spark, dir)
      t.update($"id" % 10 === 4, Map("p" -> lit("moved")))
      val got = t.toDF.select("id", "p").as[(Long, String)]
        .collect().sorted.toSeq
      assert(got == (0L until 20L).map(i =>
        (i, if (i % 10 == 4) "moved" else if (i < 10) "a" else "b")).sorted)
      val snap = DeltaLog.forTable(spark, dir).update()
      // moved rows live in the new partition's files; sources are shaded
      assert(snap.allFiles.exists(_.partitionValues.get("p").contains("moved")))
      assert(snap.dvCardinality == 2L)
      // partition-pruned read of the new partition sees exactly the moves
      assert(t.toDF.filter($"p" === "moved").select("id").as[Long]
        .collect().sorted.toSeq == Seq(4L, 14L))
    }
  }

  test("DV merge with CDF records update/delete/insert change rows") {
    withTempDir { dir =>
      DeltaTable.write((0L until 6L).map(i => (i, 0L)).toDF("id", "v"), dir,
        configuration = dvConf + ("delta.enableChangeDataFeed" -> "true"))
      val t = DeltaTable.forPath(spark, dir)
      val src = Seq((1L, 11L), (2L, 22L), (100L, 1L)).toDF("id", "v")
      t.merge(src, col("t.id") === col("s.id"))
        .whenMatchedDelete(col("s.id") === 2L)
        .whenMatchedUpdate(Map("v" -> col("s.v")))
        .whenNotMatchedInsertAll()
        .execute()
      val ch = t.changes(1, 1).select("_change_type", "id", "v")
        .as[(String, Long, Long)].collect().sorted.toSeq
      assert(ch == Seq(
        ("delete", 2L, 0L),
        ("insert", 100L, 1L),
        ("update_postimage", 1L, 11L),
        ("update_preimage", 1L, 0L)))
    }
  }

  test("CDF of a metadata delete of a SHADED file derives live rows only") {
    withTempDir { dir =>
      DeltaTable.write((0L until 10L).toDF("id").coalesce(1), dir,
        configuration = dvConf + ("delta.enableChangeDataFeed" -> "true"))
      val t = DeltaTable.forPath(spark, dir)
      t.delete($"id" % 3 === 0) // v1: shades 0,3,6,9
      t.deleteWhere(lit(true))  // v2: metadata-only remove of the shaded file
      val v2 = t.changes(2, 2)
        .filter(col("_change_type") === "delete")
        .select("id").as[Long].collect().sorted.toSeq
      assert(v2 == (0L until 10L).filterNot(_ % 3 == 0),
        "derived deletes must exclude the rows the old shade already killed")
    }
  }

  test("merge against a shaded target never matches deleted rows") {
    withTempDir { dir =>
      DeltaTable.write((0L until 10L).map(i => (i, 0L)).toDF("id", "v"), dir,
        configuration = dvConf)
      val t = DeltaTable.forPath(spark, dir)
      t.delete($"id" === 4L)
      // source hits a deleted id (4) and a live one (5): 4 must INSERT
      // (it is gone), 5 must update
      t.merge(Seq((4L, 40L), (5L, 50L)).toDF("id", "v"),
          col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("v" -> col("s.v")))
        .whenNotMatchedInsertAll()
        .execute()
      val got = t.toDF.select("id", "v").as[(Long, Long)]
        .collect().sorted.toSeq
      assert(got.contains((4L, 40L)), "deleted row must re-insert, not match")
      assert(got.contains((5L, 50L)))
      assert(got.count(_._1 == 4L) == 1)
    }
  }

  test("shading commits never leak stats_parsed into JSON; the replayed " +
      "state stays Spark-encoder-safe") {
    withTempDir { dir =>
      DeltaTable.write((0L until 40L).toDF("id").coalesce(2), dir,
        configuration = dvConf + ("delta.checkpointInterval" -> "1000"))
      val log = DeltaLog.forTable(spark, dir)
      Checkpoints.writeCheckpoint(log.update())
      DeltaLog.clearCache()
      // the state's AddFiles now carry checkpoint-parsed stats STRUCTS —
      // the shading re-add is the one committer whose in-memory action
      // holds a populated stats_parsed at commit time
      DeltaTable.forPath(spark, dir).delete($"id" === 3L)
      val l2 = DeltaLog.forTable(spark, dir)
      val v = l2.update().version
      val lines = l2.store.read(
        FileNames.deltaFile(l2.logPath, v), l2.hadoopConf).toVector
      assert(lines.exists(_.contains("deletionVector")),
        "precondition: the commit shades")
      assert(lines.forall(!_.contains("stats_parsed")),
        "stats_parsed is checkpoint-only — never commit JSON " +
          "(Jackson would read it back with type-erased Integer boxes)")
      // the Jackson-replayed state must survive a Spark encoder
      // round-trip (the carry-over fuzz's original failure mode)
      DeltaLog.clearCache()
      val files = DeltaLog.forTable(spark, dir).update().allFiles
      implicit val enc = org.apache.spark.sql.Encoders.product[AddFile]
      assert(spark.createDataset(files).count() == files.size)
    }
  }
}
