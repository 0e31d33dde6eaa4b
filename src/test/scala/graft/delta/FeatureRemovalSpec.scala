package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `DROP FEATURE` ([[FeatureRemoval]]): trace-validated protocol
  * downgrade; reader-feature drops add checkpointProtection + a boundary
  * checkpoint; TRUNCATE HISTORY deletes the pre-downgrade prefix. */
class FeatureRemovalSpec extends SparkSpec {
  import spark.implicits._

  private val dvConf = Map("delta.enableDeletionVectors" -> "true")

  private def logFilesBelow(log: DeltaLog, v: Long): Seq[String] = {
    val fs = log.logPath.getFileSystem(log.hadoopConf)
    fs.listStatus(log.logPath).toSeq.map(_.getPath)
      .filter(p => FileNames.isDeltaFile(p) || FileNames.isCheckpointFile(p))
      .filter { p =>
        val ver = if (FileNames.isDeltaFile(p)) FileNames.deltaVersion(p)
          else FileNames.checkpointVersion(p)
        ver < v
      }.map(_.getName)
  }

  test("deletionVectors: refused while shaded, dropped after purge, " +
      "history protected") {
    withTempDir { dir =>
      DeltaTable.write((0L until 100L).toDF("id").coalesce(2), dir,
        configuration = dvConf)
      val t = DeltaTable.forPath(spark, dir)
      t.delete($"id" < 10L) // shades
      val log = DeltaLog.forTable(spark, dir)
      assert(log.update().allFiles.exists(_.deletionVector.isDefined))

      val e = intercept[IllegalArgumentException](t.dropFeature("deletionVectors"))
      assert(e.getMessage.contains("OPTIMIZE"), e.getMessage)

      t.compact() // purges the shades
      val v = t.dropFeature("deletionVectors")
      val snap = log.update()
      val p = snap.protocol
      assert(!p.readerFeatures.exists(_.contains("deletionVectors")))
      assert(!p.writerFeatures.exists(_.contains("deletionVectors")))
      assert(p.writerFeatures.exists(_.contains("checkpointProtection")))
      assert(!snap.metadata.configuration.contains("delta.enableDeletionVectors"))
      assert(DeltaConfigs.REQUIRE_CHECKPOINT_PROTECTION
        .fromMetadata(snap.metadata) == v)
      // no reader features left: old readers regain the table
      assert(p.minReaderVersion == 1, p.toString)
      // the boundary checkpoint exists at the downgrade version
      assert(Checkpoints.lastCheckpoint(log).exists(_.version == v))
      // data intact; pre-downgrade versions still time-travel
      assert(t.toDF.count() == 90)
      assert(t.asOfVersion(0).count() == 100)
    }
  }

  test("TRUNCATE HISTORY deletes the pre-downgrade prefix") {
    withTempDir { dir =>
      DeltaTable.write((0L until 50L).toDF("id").coalesce(1), dir,
        configuration = dvConf)
      val t = DeltaTable.forPath(spark, dir)
      t.delete($"id" < 5L)
      t.compact()
      val log = DeltaLog.forTable(spark, dir)
      val v = t.dropFeature("deletionVectors", truncateHistory = true)
      assert(logFilesBelow(log, v).isEmpty,
        s"stale prefix: ${logFilesBelow(log, v)}")
      DeltaLog.clearCache()
      val fresh = DeltaTable.forPath(spark, dir)
      assert(fresh.toDF.count() == 45) // cold read from the boundary checkpoint
      intercept[Exception](fresh.asOfVersion(0).count())
    }
  }

  test("writer-only drop (inCommitTimestamp) needs no history protection") {
    withTempDir { dir =>
      DeltaTable.write((1 to 10).toDF("v"), dir,
        configuration = Map("delta.enableInCommitTimestamps" -> "true"))
      DeltaTable.write((11 to 20).toDF("v"), dir)
      val t = DeltaTable.forPath(spark, dir)
      t.dropFeature("inCommitTimestamp")
      val snap = DeltaLog.forTable(spark, dir).update()
      assert(!snap.protocol.writerFeatures.exists(_.contains("inCommitTimestamp")))
      assert(!snap.protocol.writerFeatures.exists(_.contains("checkpointProtection")))
      assert(!snap.metadata.configuration.keys.exists(_.contains("nCommitTimestamp")))
      DeltaTable.write((21 to 30).toDF("v"), dir) // still writable
      assert(t.toDF.count() == 30)
    }
  }

  test("refusals: traces present, unknown feature, legacy-implied, " +
      "unprotected checkpointProtection") {
    withTempDir { dir =>
      // features-form table (DV) + a constraint: the constraint-declaring
      // commit must LIST checkConstraints (writer-7 conformance), and the
      // drop must refuse while the constraint lives
      DeltaTable.write((1 to 5).toDF("v"), dir, configuration = dvConf)
      val t = DeltaTable.forPath(spark, dir)
      t.delete($"v" === 1)
      t.addConstraint("pos", "v > 0")
      assert(DeltaLog.forTable(spark, dir).update().protocol
        .writerFeatures.exists(_.contains("checkConstraints")),
        "writer-7 protocol must list the obliged constraint feature")
      val e1 = intercept[IllegalArgumentException](t.dropFeature("checkConstraints"))
      assert(e1.getMessage.contains("DROP CONSTRAINT"), e1.getMessage)
      t.dropConstraint("pos")
      t.dropFeature("checkConstraints")
      assert(!DeltaLog.forTable(spark, dir).update().protocol
        .writerFeatures.exists(_.contains("checkConstraints")))
    }
    withTempDir { dir =>
      DeltaTable.write((1 to 5).toDF("v"), dir)
      val t = DeltaTable.forPath(spark, dir)
      // legacy protocol lists nothing: appendOnly is version-implied
      val e2 = intercept[IllegalArgumentException](t.dropFeature("appendOnly"))
      assert(e2.getMessage.contains("legacy"), e2.getMessage)
      val e3 = intercept[IllegalArgumentException](t.dropFeature("notAFeature"))
      assert(e3.getMessage.contains("notAFeature"), e3.getMessage)
    }
    withTempDir { dir =>
      DeltaTable.write((1 to 5).toDF("v"), dir, configuration = dvConf)
      val t = DeltaTable.forPath(spark, dir)
      t.delete($"v" === 1)
      t.compact()
      t.dropFeature("deletionVectors") // adds checkpointProtection
      val e = intercept[IllegalArgumentException](
        t.dropFeature("checkpointProtection"))
      assert(e.getMessage.contains("TRUNCATE HISTORY"), e.getMessage)
      // and WITH truncation it drops cleanly
      t.dropFeature("checkpointProtection", truncateHistory = true)
      val p = DeltaLog.forTable(spark, dir).update().protocol
      assert(!p.writerFeatures.exists(_.contains("checkpointProtection")))
    }
  }

  test("clustering drops after CLUSTER BY NONE, refuses while declared") {
    withTempDir { dir =>
      DeltaTable.write((1 to 20).map(i => (i.toLong, i % 3)).toDF("id", "grp"),
        dir)
      val t = DeltaTable.forPath(spark, dir)
      t.setClusteringColumns(Seq("grp"))
      val e = intercept[IllegalArgumentException](t.dropFeature("clustering"))
      assert(e.getMessage.contains("CLUSTER BY NONE"), e.getMessage)
      t.setClusteringColumns(Nil)
      t.dropFeature("clustering")
      assert(!DeltaLog.forTable(spark, dir).update().protocol
        .writerFeatures.exists(_.contains("clustering")))
    }
  }

  test("property DDL on path tables: the unset-then-drop remedy works " +
      "end to end") {
    withTempDir { dir =>
      DeltaTable.write((1 to 8).toDF("v"), dir, configuration = dvConf)
      val t0 = DeltaTable.forPath(spark, dir)
      t0.delete($"v" === 1) // shading commit upgrades to (3,7)
      spark.sql(s"ALTER TABLE '$dir' SET TBLPROPERTIES " +
        "('delta.enableChangeDataFeed'='true')")
      val snap = DeltaLog.forTable(spark, dir).update()
      assert(DeltaConfigs.ENABLE_CHANGE_DATA_FEED.fromMetadata(snap.metadata))
      // writer-7 conformance listed the feature with the enabling commit
      assert(snap.protocol.writerFeatures.exists(_.contains("changeDataFeed")))
      val t = DeltaTable.forPath(spark, dir)
      val e = intercept[IllegalArgumentException](t.dropFeature("changeDataFeed"))
      assert(e.getMessage.contains("Unset"), e.getMessage)
      spark.sql(s"ALTER TABLE '$dir' UNSET TBLPROPERTIES " +
        "('delta.enableChangeDataFeed')")
      t.dropFeature("changeDataFeed")
      assert(!DeltaLog.forTable(spark, dir).update().protocol
        .writerFeatures.exists(_.contains("changeDataFeed")))
    }
  }

  test("SET TBLPROPERTIES on a legacy table bumps the writer version " +
      "its properties oblige") {
    withTempDir { dir =>
      DeltaTable.write((1 to 8).toDF("v"), dir)
      assert(DeltaLog.forTable(spark, dir).update()
        .protocol.minWriterVersion == 2)
      spark.sql(s"ALTER TABLE '$dir' SET TBLPROPERTIES " +
        "('delta.enableChangeDataFeed'='true')")
      val p = DeltaLog.forTable(spark, dir).update().protocol
      assert(p.minWriterVersion == 4, p.toString) // CDF needs writer 4
    }
  }

  test("SET TBLPROPERTIES enabling deletionVectors declares the reader " +
      "feature with the enabling commit") {
    withTempDir { dir =>
      DeltaTable.write((1 to 8).toDF("v"), dir)
      spark.sql(s"ALTER TABLE '$dir' SET TBLPROPERTIES " +
        "('delta.enableDeletionVectors'='true')")
      val p = DeltaLog.forTable(spark, dir).update().protocol
      assert(p.minReaderVersion == 3 &&
        p.readerFeatures.exists(_.contains("deletionVectors")), p.toString)
    }
  }

  test("RESTORE past a drop re-declares the features its state resurrects") {
    withTempDir { dir =>
      DeltaTable.write((0L until 40L).toDF("id").coalesce(1), dir,
        configuration = dvConf)
      val t = DeltaTable.forPath(spark, dir)
      t.delete($"id" < 4L) // v1: shades
      val shadedVersion = DeltaLog.forTable(spark, dir).update().version
      t.compact()
      t.dropFeature("deletionVectors")
      assert(!DeltaLog.forTable(spark, dir).update().protocol
        .readerFeatures.exists(_.contains("deletionVectors")))

      t.restore(shadedVersion) // brings shaded files AND the property back
      val snap = DeltaLog.forTable(spark, dir).update()
      assert(snap.allFiles.exists(_.deletionVector.isDefined),
        "restore must bring the shaded files back")
      assert(snap.protocol.readerFeatures.exists(_.contains("deletionVectors")),
        "a protocol not declaring deletionVectors while files carry them " +
          "would break foreign readers")
      assert(t.toDF.count() == 36) // shades still apply
    }
  }

  test("rowTracking drop tombstones its domain; domainMetadata drops after") {
    withTempDir { dir =>
      DeltaTable.write((1 to 10).toDF("v"), dir,
        configuration = Map("delta.enableRowTracking" -> "true"))
      val log = DeltaLog.forTable(spark, dir)
      assert(log.update().domainMetadata.contains("delta.rowTracking"))
      val t = DeltaTable.forPath(spark, dir)
      t.dropFeature("rowTracking")
      val snap = log.update()
      assert(!snap.protocol.writerFeatures.exists(_.contains("rowTracking")))
      assert(!snap.domainMetadata.contains("delta.rowTracking"),
        "the high-water-mark domain must not outlive its feature")
      t.dropFeature("domainMetadata") // no orphan domain blocks it now
      assert(!log.update().protocol.writerFeatures
        .exists(_.contains("domainMetadata")))
    }
  }

  test("unset refuses protocol-critical keys by name") {
    withTempDir { dir =>
      DeltaTable.write((1 to 5).toDF("v"), dir)
      val t = DeltaTable.forPath(spark, dir)
      val e1 = intercept[IllegalArgumentException](
        t.unsetProperties(Seq("delta.columnMapping.mode")))
      assert(e1.getMessage.contains("physical name"), e1.getMessage)
      val e2 = intercept[IllegalArgumentException](
        t.unsetProperties(Seq("delta.requireCheckpointProtectionBeforeVersion")))
      assert(e2.getMessage.contains("TRUNCATE HISTORY"), e2.getMessage)
    }
  }

  test("RESTORE past a v2Checkpoint drop re-declares the feature") {
    withTempDir { dir =>
      DeltaTable.write((1 to 10).toDF("v"), dir,
        configuration = Map("delta.checkpointPolicy" -> "v2"))
      val log = DeltaLog.forTable(spark, dir)
      // declare the feature the policy obliges (the policy-enabling
      // CREATE went through the property path)
      val t = DeltaTable.forPath(spark, dir)
      val preDrop = log.update().version
      t.dropFeature("v2Checkpoint")
      assert(!log.update().metadata.configuration.contains("delta.checkpointPolicy"))
      t.restore(preDrop)
      val snap = log.update()
      assert(DeltaConfigs.CHECKPOINT_POLICY.fromMetadata(snap.metadata) == "v2")
      assert(snap.protocol.readerFeatures.exists(_.contains("v2Checkpoint")),
        s"v2 policy restored without the reader feature: ${snap.protocol}")
    }
  }

  test("dropping a writer feature from a legacy-reader (2, 7) protocol " +
      "keeps reader 2") {
    withTempDir { dir =>
      DeltaTable.write((1 to 5).toDF("v"), dir)
      val log = DeltaLog.forTable(spark, dir)
      log.startTransaction().commit(Seq(Protocol(2, 7, None,
        Some(Seq("appendOnly", "invariants", "columnMapping", "rowTracking")))),
        "UPGRADE PROTOCOL")
      DeltaTable.forPath(spark, dir).dropFeature("rowTracking")
      val p = log.update().protocol
      assert(p.minReaderVersion == 2,
        s"reader version must not be raised by a writer-side drop: $p")
      assert(p.readerFeatures.isEmpty)
      assert(!p.writerFeatures.exists(_.contains("rowTracking")))
    }
  }

  test("SQL: ALTER TABLE DROP FEATURE [TRUNCATE HISTORY]") {
    withTempDir { dir =>
      DeltaTable.write((0L until 30L).toDF("id").coalesce(1), dir,
        configuration = dvConf)
      val t = DeltaTable.forPath(spark, dir)
      t.delete($"id" < 3L)
      t.compact()
      spark.sql(s"ALTER TABLE '$dir' DROP FEATURE deletionVectors")
      val log = DeltaLog.forTable(spark, dir)
      assert(!log.update().protocol.readerFeatures
        .exists(_.contains("deletionVectors")))
      spark.sql(s"ALTER TABLE '$dir' DROP FEATURE checkpointProtection " +
        "TRUNCATE HISTORY")
      assert(!log.update().protocol.writerFeatures
        .exists(_.contains("checkpointProtection")))
      assert(t.toDF.count() == 27)
    }
  }
}
