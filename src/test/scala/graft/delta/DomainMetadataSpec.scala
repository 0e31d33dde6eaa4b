package graft.delta

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Domain metadata (PROTOCOL.md "Domain Metadata", writer feature
  * domainMetadata) and the `delta.clustering` domain that rides on it
  * (liquid-style clustered tables: OPTIMIZE re-clusters by the declared
  * columns). */
class DomainMetadataSpec extends SparkSpec {
  import spark.implicits._

  test("set / last-writer-wins / remove; protocol upgrades writer-only") {
    withTempDir { dir =>
      DeltaTable.write((0L until 10L).toDF("id"), dir)
      val t = DeltaTable.forPath(spark, dir)
      t.setDomainMetadata("app.retention", """{"days":30}""")
      assert(t.domainMetadata == Map("app.retention" -> """{"days":30}"""))
      val p = DeltaLog.forTable(spark, dir).update().protocol
      assert(p.minWriterVersion == 7 &&
        p.writerFeatures.get.contains("domainMetadata"))
      assert(p.minReaderVersion == 1, "domains never gate readers")

      t.setDomainMetadata("app.retention", """{"days":7}""")
      t.setDomainMetadata("other.domain", "x")
      assert(t.domainMetadata == Map(
        "app.retention" -> """{"days":7}""", "other.domain" -> "x"))

      t.removeDomainMetadata("app.retention")
      assert(t.domainMetadata == Map("other.domain" -> "x"))
    }
  }

  test("domains survive classic AND v2 checkpoints; removal after wins") {
    for (policy <- Seq("classic", "v2")) withTempDir { dir =>
      DeltaTable.write((0L until 10L).toDF("id"), dir,
        configuration = Map("delta.checkpointPolicy" -> policy))
      val t = DeltaTable.forPath(spark, dir)
      t.setDomainMetadata("keep.me", "1")
      t.setDomainMetadata("drop.me", "2")
      val log = DeltaLog.forTable(spark, dir)
      Checkpoints.writeCheckpoint(log.update())
      t.removeDomainMetadata("drop.me") // a commit AFTER the checkpoint
      // drop every commit the checkpoint subsumes (v0..v2 — the removal
      // commit v3 stays): the fold must seed the domains from checkpoint
      // bytes alone and then apply the live removal on top
      val logDir = new File(dir, "_delta_log")
      (0L to 2L).foreach(v => new File(logDir, f"$v%020d.json").delete())
      DeltaLog.clearCache()
      val fresh = DeltaTable.forPath(spark, dir)
      assert(fresh.domainMetadata == Map("keep.me" -> "1"),
        s"policy=$policy must round-trip live domains and honor removal")
      assert(fresh.toDF.count() == 10)
    }
  }

  test("concurrent changes to the SAME domain conflict; disjoint commute") {
    withTempDir { dir =>
      DeltaTable.write((0L until 5L).toDF("id"), dir)
      val log = DeltaLog.forTable(spark, dir)
      val t = DeltaTable.forPath(spark, dir)
      t.setDomainMetadata("shared", "seed")

      val txn = log.startTransaction()
      t.setDomainMetadata("shared", "winner") // wins the race
      intercept[graft.delta.txn.ConcurrentWriteException] {
        txn.commit(Seq(DomainMetadata("shared", "loser")),
          DeltaOperations.SetDomainMetadata)
      }
      assert(t.domainMetadata("shared") == "winner")

      val txn2 = log.startTransaction()
      t.setDomainMetadata("shared", "winner2")
      txn2.commit(Seq(DomainMetadata("disjoint", "fine")),
        DeltaOperations.SetDomainMetadata) // different domain: no conflict
      assert(t.domainMetadata == Map(
        "shared" -> "winner2", "disjoint" -> "fine"))
    }
  }

  test("clustered table: OPTIMIZE re-clusters by the declared columns") {
    withTempDir { dir =>
      val data = (0L until 400L).map(i => (i, i % 20, (i * 7) % 20))
        .toDF("id", "x", "y")
      DeltaTable.write(data.repartition(4), dir)
      val t = DeltaTable.forPath(spark, dir)
      t.setClusteringColumns(Seq("x", "y"))
      assert(t.clusteringColumns == Seq("x", "y"))
      val p = DeltaLog.forTable(spark, dir).update().protocol
      assert(p.writerFeatures.get.contains("clustering"))

      t.compact(targetFileBytes = 4096) // no explicit zOrderBy
      val h = t.history().filter(col("operation") === "OPTIMIZE")
        .select("operationParameters").as[Map[String, String]].collect()
      assert(h.exists(_.get("zOrderBy").exists(s =>
        s.contains("x") && s.contains("y"))),
        s"OPTIMIZE must have clustered by the declared columns: ${h.toSeq}")
      assert(t.toDF.count() == 400)
      // the clustering pays off: a 2-d predicate prunes by file stats
      val pruned = t.toDF.filter($"x" === 3 && $"y" === 10)
      assert(pruned.count() == data.filter($"x" === 3 && $"y" === 10).count())
    }
  }

  test("foreign domainMetadata actions parse; feature tables stay writable") {
    withTempDir { dir =>
      DeltaTable.write((0L until 5L).toDF("id"), dir)
      val log = DeltaLog.forTable(spark, dir)
      // a foreign writer's commit: protocol with the features + a domain
      val proto = Protocol(1, 7, writerFeatures =
        Some(Seq("appendOnly", "clustering", "domainMetadata", "invariants")))
      val lines = Seq(
        JsonCodec.toJson(proto.wrap),
        """{"domainMetadata":{"domain":"delta.clustering","configuration":"{\"clusteringColumns\":[[\"id\"]]}","removed":false}}""")
      log.store.write(FileNames.deltaFile(log.logPath, 1),
        lines.iterator, overwrite = false, log.hadoopConf)
      DeltaLog.clearCache()
      val t = DeltaTable.forPath(spark, dir)
      assert(t.clusteringColumns == Seq("id"))
      // we implement both features: the table accepts our writes and the
      // domain is preserved through them
      DeltaTable.write((5L until 10L).toDF("id"), dir)
      assert(t.toDF.count() == 10)
      assert(t.clusteringColumns == Seq("id"))
    }
  }
}
