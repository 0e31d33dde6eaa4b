package graft.delta

import java.io.File
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** `GENERATE symlink_format_manifest`: layout, exact active-file
  * content, Hive escaping, the incremental post-commit mode, emptied
  * partitions, and the DV / column-mapping refusals. */
class SymlinkManifestSpec extends SparkSpec {
  import spark.implicits._

  private def manifestLines(dir: String, rel: String): Seq[String] = {
    val p = Paths.get(dir, SymlinkManifest.ManifestDirName, rel)
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty)
  }

  private def activeAbs(spark: org.apache.spark.sql.SparkSession,
                        dir: String): Set[String] = {
    val log = DeltaLog.forTable(spark, dir)
    log.update().allFiles.map(f =>
      read.PartitionUtils.absolutePath(log.dataPath, f.path).toString).toSet
  }

  test("partitioned manifest tree lists exactly the active files") {
    withTempDir { dir =>
      DeltaTable.write(
        Seq((1, "a"), (2, "a"), (3, "b")).toDF("v", "part").repartition(2),
        dir, partitionBy = Seq("part"))
      val n = DeltaTable.forPath(spark, dir).generateSymlinkManifest()
      assert(n == 2, s"one manifest per partition, got $n")
      val a = manifestLines(dir, "part=a/manifest")
      val b = manifestLines(dir, "part=b/manifest")
      assert((a ++ b).toSet == activeAbs(spark, dir),
        s"manifest files != active files")
      assert(a.forall(_.startsWith("file:")), s"URIs must be absolute: $a")
      assert(a == a.sorted, "deterministic order")

      // full regenerate after an overwrite drops the stale tree
      DeltaTable.write(Seq((9, "c")).toDF("v", "part"), dir,
        org.apache.spark.sql.SaveMode.Overwrite, partitionBy = Seq("part"))
      assert(DeltaTable.forPath(spark, dir).generateSymlinkManifest() == 1)
      assert(manifestLines(dir, "part=a/manifest").isEmpty &&
        !Files.exists(Paths.get(dir, SymlinkManifest.ManifestDirName, "part=a")),
        "stale partition manifest must be wiped")
      assert(manifestLines(dir, "part=c/manifest").toSet ==
        activeAbs(spark, dir))
    }
  }

  test("unpartitioned table writes a single root manifest") {
    withTempDir { dir =>
      DeltaTable.write((1 to 10).toDF("v").repartition(3), dir)
      assert(DeltaTable.forPath(spark, dir).generateSymlinkManifest() == 1)
      assert(manifestLines(dir, "manifest").toSet == activeAbs(spark, dir))
    }
  }

  test("hive escaping: special chars and null partition values") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "x y/z"), (2, null.asInstanceOf[String]))
        .toDF("v", "part"), dir, partitionBy = Seq("part"))
      DeltaTable.forPath(spark, dir).generateSymlinkManifest()
      val root = Paths.get(dir, SymlinkManifest.ManifestDirName)
      val dirs = Files.list(root).iterator().asScala
        .map(_.getFileName.toString).toSet
      assert(dirs.contains("part=x y%2Fz"), s"escaped dirs: $dirs")
      assert(dirs.contains("part=__HIVE_DEFAULT_PARTITION__"),
        s"null spelling: $dirs")
      val all = dirs.toSeq.flatMap(d => manifestLines(dir, s"$d/manifest"))
      assert(all.toSet == activeAbs(spark, dir))
    }
  }

  test("auto-update mode refreshes only touched partitions and drops " +
      "emptied ones") {
    withTempDir { dir =>
      DeltaTable.write(
        Seq((1, "a"), (2, "b")).toDF("v", "part"), dir,
        partitionBy = Seq("part"),
        configuration = Map(SymlinkManifest.AutoUpdateKey -> "true"))
      // the CREATE commit itself ran the hook
      assert(manifestLines(dir, "part=a/manifest").nonEmpty &&
        manifestLines(dir, "part=b/manifest").nonEmpty)

      val aBefore = manifestLines(dir, "part=a/manifest")
      DeltaTable.write(Seq((3, "b")).toDF("v", "part"), dir)
      assert(manifestLines(dir, "part=a/manifest") == aBefore,
        "untouched partition's manifest must not be rewritten")
      assert(manifestLines(dir, "part=b/manifest").toSet ==
        activeAbs(spark, dir).filter(f =>
          manifestLines(dir, "part=b/manifest").contains(f)),
        "touched partition reflects the append")
      assert(manifestLines(dir, "part=b/manifest").size == 2)

      // emptying a partition removes its manifest directory
      DeltaTable.forPath(spark, dir).deleteWhere($"part" === "a")
      assert(!Files.exists(
        Paths.get(dir, SymlinkManifest.ManifestDirName, "part=a")),
        "emptied partition keeps no manifest")
      assert(manifestLines(dir, "part=b/manifest").size == 2)
    }
  }

  test("auto-update on an EMPTIED unpartitioned table leaves an empty " +
      "manifest, matching generate()") {
    withTempDir { dir =>
      DeltaTable.write((1 to 5).toDF("v").coalesce(1), dir,
        configuration = Map(SymlinkManifest.AutoUpdateKey -> "true"))
      assert(manifestLines(dir, "manifest").nonEmpty)
      DeltaTable.forPath(spark, dir).deleteWhere(
        org.apache.spark.sql.functions.lit(true))
      val p = Paths.get(dir, SymlinkManifest.ManifestDirName, "manifest")
      assert(Files.exists(p),
        "a symlink reader must still find a manifest after the table empties")
      assert(manifestLines(dir, "manifest").isEmpty, "and it must be empty")
    }
  }

  test("a failing auto-update hook surfaces as PostCommitHookException " +
      "AFTER the commit is durable") {
    withTempDir { dir =>
      // enabling DVs makes the hook's checkSupported refuse as soon as a
      // shading commit lands — the refusal must not read as a failed DML
      DeltaTable.write((1 to 50).toDF("v").coalesce(1), dir,
        configuration = Map(
          SymlinkManifest.AutoUpdateKey -> "true",
          "delta.enableDeletionVectors" -> "true"))
      val log = DeltaLog.forTable(spark, dir)
      val before = log.update().version
      val e = intercept[graft.delta.txn.PostCommitHookException](
        DeltaTable.forPath(spark, dir).delete($"v" <= 5))
      assert(e.version == before + 1, "exception names the durable version")
      assert(e.getMessage.contains("succeeded"), e.getMessage)
      // the DELETE is in the table despite the hook failure
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 45)
      assert(log.update().version == before + 1)
    }
  }

  test("SQL GENERATE; unknown mode refuses; DV table refuses") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "a")).toDF("v", "part"), dir,
        partitionBy = Seq("part"))
      val n = spark.sql(s"GENERATE symlink_format_manifest FOR TABLE '$dir'")
        .collect().head.getLong(1)
      assert(n == 1)
      val e = intercept[Exception](
        spark.sql(s"GENERATE bogus_manifest FOR TABLE '$dir'").collect())
      assert(e.getMessage.contains("Unknown GENERATE mode"), e.getMessage)
    }
    withTempDir { dir =>
      DeltaTable.write((1 to 50).toDF("v").coalesce(1), dir,
        configuration = Map("delta.enableDeletionVectors" -> "true"))
      val t = DeltaTable.forPath(spark, dir)
      t.delete($"v" <= 5)
      val e = intercept[IllegalArgumentException](t.generateSymlinkManifest())
      assert(e.getMessage.contains("deletion"), e.getMessage)
      t.compact() // purge shades: generation becomes legal again
      assert(t.generateSymlinkManifest() == 1)
      assert(manifestLines(dir, "manifest").toSet == activeAbs(spark, dir))
    }
  }
}
