package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Shallow CLONE: zero-copy table fork with independent history. */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  test("clone reads the source's data without copying any file") {
    withTempDir { src =>
      withTempDir { dst =>
        val target = s"$dst/cloned"
        DeltaTable.write(
          spark.range(0, 100).toDF("id").withColumn("part", $"id" % 4),
          src, partitionBy = Seq("part"))
        DeltaTable.forPath(spark, src).cloneTo(target)

        val clone = DeltaTable.forPath(spark, target)
        assert(clone.toDF.count() == 100)
        assert(clone.toDF.agg(sum($"id")).as[Long].head() == 4950L)
        // zero copy: no parquet under the clone's directory
        val cloneFiles = new java.io.File(target).listFiles()
          .filter(_.getName.endsWith(".parquet"))
        assert(cloneFiles.isEmpty)
        // partition pruning still works through absolute paths
        assert(clone.toDF.filter($"part" === 1).count() == 25)
        val hist = clone.history()
          .select($"operation").as[String].collect().toSeq
        assert(hist == Seq("CLONE"))
      }
    }
  }

  test("clone evolves independently of the source") {
    withTempDir { src =>
      withTempDir { dst =>
        val target = s"$dst/cloned"
        DeltaTable.write(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "s"), src)
        DeltaTable.forPath(spark, src).cloneTo(target)
        val clone = DeltaTable.forPath(spark, target)

        clone.delete($"id" === 1)
        DeltaTable.write(Seq((9, "z")).toDF("id", "s"), target)

        // clone sees its own mutations…
        assert(clone.toDF.select($"id").as[Int].collect().sorted.toSeq
          == Seq(2, 3, 9))
        // …the source is untouched (files AND log)
        val source = DeltaTable.forPath(spark, src)
        assert(source.toDF.select($"id").as[Int].collect().sorted.toSeq
          == Seq(1, 2, 3))
        assert(source.deltaLog.update().version == 0)
        // and the clone's new file landed in its own directory
        assert(new java.io.File(target).listFiles()
          .exists(f => f.getName.startsWith("batch-")))
        // time travel inside the clone reaches its CLONE version
        assert(clone.asOfVersion(0).count() == 3)
      }
    }
  }

  test("source mutations after the clone do not leak into the clone") {
    withTempDir { src =>
      withTempDir { dst =>
        val target = s"$dst/cloned"
        DeltaTable.write(Seq((1, "a"), (2, "b")).toDF("id", "s"), src)
        DeltaTable.forPath(spark, src).cloneTo(target)
        DeltaTable.write(Seq((3, "c")).toDF("id", "s"), src)
        DeltaTable.forPath(spark, src).delete($"id" === 1)

        // the clone pinned the files of source v0 — delete tombstones in
        // the source log don't apply to it (files still on disk: vacuum
        // retention has not elapsed)
        assert(DeltaTable.forPath(spark, target).toDF
          .select($"id").as[Int].collect().sorted.toSeq == Seq(1, 2))
      }
    }
  }

  test("clone preserves metadata but generates a fresh table id") {
    withTempDir { src =>
      withTempDir { dst =>
        val target = s"$dst/cloned"
        DeltaTable.write(Seq((1, 10)).toDF("id", "v"), src,
          configuration = Map("delta.appendOnly" -> "false",
            "custom.prop" -> "kept"))
        DeltaTable.forPath(spark, src).addConstraint("v_pos", "v > 0")
        DeltaTable.forPath(spark, src).cloneTo(target)

        val srcMeta = DeltaTable.forPath(spark, src).deltaLog.update().metadata
        val cloneSnap = DeltaTable.forPath(spark, target).deltaLog.update()
        assert(cloneSnap.metadata.id != srcMeta.id)
        assert(cloneSnap.metadata.schema == srcMeta.schema)
        assert(cloneSnap.metadata.configuration("custom.prop") == "kept")
        // constraints (and the protocol that guards them) travel with it
        assert(cloneSnap.metadata.configuration
          .contains("delta.constraints.v_pos"))
        assert(cloneSnap.protocol.minWriterVersion == 3)
        intercept[Exception] {
          DeltaTable.write(Seq((2, -1)).toDF("id", "v"), target)
        }
        // cloning onto an existing table is refused
        intercept[IllegalArgumentException] {
          DeltaTable.forPath(spark, src).cloneTo(target)
        }
      }
    }
  }

  test("VACUUM on a clone never deletes the source's files") {
    withTempDir { src =>
      withTempDir { dst =>
        val target = s"$dst/cloned"
        DeltaTable.write(Seq((1, "a"), (2, "b")).toDF("id", "s"), src)
        DeltaTable.forPath(spark, src).cloneTo(target)
        val clone = DeltaTable.forPath(spark, target)
        // tombstone the (absolute-path) source files in the clone's log,
        // then vacuum far past retention: the listing is clone-rooted, so
        // the source files are simply not candidates
        clone.delete($"id" === 1)
        val log = DeltaLog.forTable(spark, target)
        log.clock = () => System.currentTimeMillis() + 30L * 24 * 3600 * 1000
        clone.vacuum()
        // the source still reads completely
        assert(DeltaTable.forPath(spark, src).toDF.count() == 2)
        // and the clone's own surviving reference still resolves
        assert(clone.toDF.select($"id").as[Int].collect().toSeq == Seq(2))
      }
    }
  }

  test("SQL: CREATE TABLE ... SHALLOW CLONE") {
    withTempDir { src =>
      withTempDir { dst =>
        val target = s"$dst/cloned"
        DeltaTable.write(Seq((1, "a"), (2, "b")).toDF("id", "s"), src)
        spark.sql(s"CREATE TABLE '$target' SHALLOW CLONE '$src'")
        assert(DeltaTable.forPath(spark, target).toDF.count() == 2)
      }
    }
  }
  test("time-travel clone pins a historical snapshot") {
    withTempDir { src =>
      DeltaTable.write(Seq(1, 2).toDF("v"), src)        // v0
      DeltaTable.write(Seq(3).toDF("v"), src)           // v1
      DeltaTable.forPath(spark, src).deleteWhere(lit(true)) // v2: empty
      withTempDir { t0 =>
        val target = s"$t0/clone_v1"
        DeltaTable.forPath(spark, src)
          .cloneTo(target, versionAsOf = Some(1L))
        assert(DeltaTable.forPath(spark, target).toDF
          .as[Int].collect().sorted.toSeq == Seq(1, 2, 3),
          "clone must see version 1's rows, not the emptied head")
        // recorded provenance names the PINNED version
        val ci = DeltaLog.forTable(spark, target).history()
          .find(_.operation.contains("CLONE")).get
        assert(ci.operationParameters.get("sourceVersion") == "1")
      }
      withTempDir { t1 =>
        val target = s"$t1/clone_sql"
        spark.sql(
          s"CREATE TABLE '$target' SHALLOW CLONE '$src' VERSION AS OF 0")
        assert(DeltaTable.forPath(spark, target).toDF
          .as[Int].collect().sorted.toSeq == Seq(1, 2))
      }
      intercept[IllegalArgumentException] {
        DeltaTable.forPath(spark, src).cloneTo("/tmp/never",
          versionAsOf = Some(0L), timestampMillisAsOf = Some(1L))
      }
    }
  }
}
