package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DEEP CLONE: an independent physical copy — the backup/fork shape.
  * The defining property under test: the clone survives the source's
  * complete destruction (shallow clones, which borrow files, do not). */
class DeepCloneSpec extends SparkSpec {
  import spark.implicits._

  private def rmrf(p: String): Unit = {
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
    }
    rm(new java.io.File(p))
  }

  test("deep clone survives source deletion; stats carry over verbatim") {
    withTempDir { base =>
      val src = s"$base/src"; val dst = s"$base/dst"
      DeltaTable.write((1L to 300L).toDF("id")
        .withColumn("p", $"id" % 3).repartition(3, $"p"),
        src, partitionBy = Seq("p"))
      val srcFiles = DeltaLog.forTable(spark, src).update().allFiles
        .map(f => f.path -> f.stats).toMap

      DeltaTable.forPath(spark, src).deepCloneTo(dst)
      val cloneFiles = DeltaLog.forTable(spark, dst).update().allFiles
      // same relative paths, same stats JSON — nothing recomputed
      assert(cloneFiles.map(f => f.path -> f.stats).toMap == srcFiles)

      rmrf(src)
      DeltaLog.clearCache()
      val got = DeltaTable.forPath(spark, dst).toDF
      assert(got.count() == 300)
      assert(got.agg(sum("id")).as[Long].head == (1L to 300L).sum)
      // partition pruning still works on the clone
      assert(got.filter($"p" === 1).count() == 100)
    }
  }

  test("deep clone of a SHALLOW clone localizes the borrowed files") {
    withTempDir { base =>
      val src = s"$base/src"; val mid = s"$base/mid"; val dst = s"$base/dst"
      DeltaTable.write((1L to 50L).toDF("id"), src)
      DeltaTable.forPath(spark, src).cloneTo(mid)        // borrows src files
      DeltaTable.forPath(spark, mid).deepCloneTo(dst)    // must copy them
      rmrf(src)
      DeltaLog.clearCache()
      assert(DeltaTable.forPath(spark, dst).toDF.count() == 50)
      // the localized copies live under the clone, named into cloned/
      assert(DeltaLog.forTable(spark, dst).update().allFiles
        .forall(f => new java.net.URI(f.path).getScheme == null))
    }
  }

  test("deep clone copies deletion vectors; shaded rows stay deleted") {
    withTempDir { base =>
      val src = s"$base/src"; val dst = s"$base/dst"
      DeltaTable.write((1L to 100L).toDF("id"), src,
        configuration = Map("delta.enableDeletionVectors" -> "true"))
      DeltaTable.forPath(spark, src).delete($"id" <= 20)
      val shaded = DeltaLog.forTable(spark, src).update().allFiles
        .count(_.deletionVector.isDefined)
      assert(shaded > 0, "precondition: at least one file is DV-shaded")

      DeltaTable.forPath(spark, src).deepCloneTo(dst)
      rmrf(src)
      DeltaLog.clearCache()
      val got = DeltaTable.forPath(spark, dst).toDF
      assert(got.count() == 80)
      assert(got.agg(min("id")).as[Long].head == 21L)
    }
  }

  test("time-travel deep clone pins the historical state") {
    withTempDir { base =>
      val src = s"$base/src"; val dst = s"$base/dst"
      DeltaTable.write((1L to 10L).toDF("id"), src)
      DeltaTable.write((11L to 20L).toDF("id"), src)
      DeltaTable.forPath(spark, src).deepCloneTo(dst, versionAsOf = Some(0L))
      assert(DeltaTable.forPath(spark, dst).toDF.count() == 10)
    }
  }

  test("SQL: CREATE TABLE ... DEEP CLONE; shallow stays shallow") {
    withTempDir { base =>
      val src = s"$base/src"; val deep = s"$base/deep"
      val shallow = s"$base/shallow"
      DeltaTable.write((1L to 30L).toDF("id"), src)
      spark.sql(s"CREATE TABLE '$deep' DEEP CLONE '$src'")
      spark.sql(s"CREATE TABLE '$shallow' SHALLOW CLONE '$src'")
      // shallow borrows (absolute refs into src); deep owns relative copies
      assert(DeltaLog.forTable(spark, shallow).update().allFiles
        .forall(f => new java.net.URI(f.path).getScheme != null))
      assert(DeltaLog.forTable(spark, deep).update().allFiles
        .forall(f => new java.net.URI(f.path).getScheme == null))
      assert(DeltaLog.forTable(spark, deep).getCommitInfoAt(0)
        .operationParameters.exists(_.get("isDeepClone").contains("true")))
      rmrf(src)
      DeltaLog.clearCache()
      assert(DeltaTable.forPath(spark, deep).toDF.count() == 30)
    }
  }
}
