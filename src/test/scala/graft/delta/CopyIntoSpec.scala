package graft.delta

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.delta.write.CopyInto

/** COPY INTO: idempotent bulk file ingestion. The contract under test is
  * the one that matters in a retry loop: however many times the statement
  * re-runs over the same landed files, each file's rows land exactly
  * once — and a file rewritten in place (newer mtime) counts as new data.
  */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def stage(dir: String, name: String, ids: Range): Unit = {
    val tmp = s"$dir/.stage-$name"
    ids.toDF("id").withColumn("v", col("id") * 2)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(dir, name))
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
    }
    rm(new java.io.File(tmp))
  }

  test("re-running COPY INTO never double-loads; new files are picked up") {
    withTempDir { tbl => withTempDir { src =>
      DeltaTable.write(Seq.empty[(Long, Long)].toDF("id", "v"), tbl)
      stage(src, "a.parquet", 0 until 100)
      stage(src, "b.parquet", 100 until 150)

      val r1 = CopyInto.run(spark, tbl, src)
      assert(r1.filesLoaded == 2 && r1.rowsLoaded == 150 &&
        r1.filesSkipped == 0)

      // exact re-run: pure no-op, no new commit
      val r2 = CopyInto.run(spark, tbl, src)
      assert(r2.filesLoaded == 0 && r2.filesSkipped == 2 &&
        r2.version == r1.version)

      // a third file lands; only it loads
      stage(src, "c.parquet", 150 until 160)
      val r3 = CopyInto.run(spark, tbl, src)
      assert(r3.filesLoaded == 1 && r3.rowsLoaded == 10 &&
        r3.filesSkipped == 2)

      val got = DeltaTable.forPath(spark, tbl).toDF
      assert(got.count() == 160)
      assert(got.agg(sum("id")).as[Long].head == (0L until 160).sum)
    }}
  }

  test("a file rewritten in place (newer mtime) reloads; FORCE reloads all") {
    withTempDir { tbl => withTempDir { src =>
      DeltaTable.write(Seq.empty[(Long, Long)].toDF("id", "v"), tbl)
      stage(src, "a.parquet", 0 until 10)
      CopyInto.run(spark, tbl, src)

      // rewrite a.parquet with DIFFERENT rows and a strictly newer mtime
      Files.delete(Paths.get(src, "a.parquet"))
      stage(src, "a.parquet", 10 until 30)
      new java.io.File(src, "a.parquet")
        .setLastModified(System.currentTimeMillis() + 5000)
      val r = CopyInto.run(spark, tbl, src)
      assert(r.filesLoaded == 1 && r.rowsLoaded == 20)
      assert(DeltaTable.forPath(spark, tbl).toDF.count() == 30)

      // FORCE ignores the tracking: the same file loads again (dup rows —
      // the caller asked for it)
      val rf = CopyInto.run(spark, tbl, src, force = true)
      assert(rf.filesLoaded == 1 && rf.filesSkipped == 0)
      assert(DeltaTable.forPath(spark, tbl).toDF.count() == 50)
    }}
  }

  test("SQL face: PATTERN, FORMAT_OPTIONS csv, and the result row") {
    withTempDir { tbl => withTempDir { src =>
      DeltaTable.write(Seq.empty[(Long, String)].toDF("id", "name"), tbl)
      Files.writeString(Paths.get(src, "x.csv"), "id,name\n1,ann\n2,bo\n")
      Files.writeString(Paths.get(src, "y.csv"), "id,name\n3,cy\n")
      Files.writeString(Paths.get(src, "skip.txt"), "id,name\n9,no\n")

      val out = spark.sql(
        s"""COPY INTO '$tbl' FROM '$src' FILEFORMAT = CSV
           |PATTERN = '*.csv' FORMAT_OPTIONS('header'='true')""".stripMargin)
        .collect().head
      assert(out.getLong(1) == 2 && out.getLong(2) == 3 &&
        out.getLong(3) == 0)
      val again = spark.sql(
        s"""COPY INTO '$tbl' FROM '$src' FILEFORMAT = CSV
           |PATTERN = '*.csv' FORMAT_OPTIONS('header'='true')""".stripMargin)
        .collect().head
      assert(again.getLong(1) == 0 && again.getLong(3) == 2)
      assert(DeltaTable.forPath(spark, tbl).toDF.count() == 3)
      val names = DeltaTable.forPath(spark, tbl).toDF
        .orderBy("id").select("name").as[String].collect().toSeq
      assert(names == Seq("ann", "bo", "cy"))
    }}
  }

  test("schema contract: missing table column refuses; extra column drops") {
    withTempDir { tbl => withTempDir { src =>
      DeltaTable.write(Seq((1L, "x", 9L)).toDF("id", "name", "v"), tbl)
      // extra source column is fine (dropped); missing one refuses
      Seq((2L, "y", 8L, "extra")).toDF("id", "name", "v", "junk")
        .coalesce(1).write.mode("overwrite").parquet(s"$src/good")
      val r = CopyInto.run(spark, tbl, s"$src/good")
      assert(r.rowsLoaded == 1)
      assert(DeltaTable.forPath(spark, tbl).toDF.columns.toSet ==
        Set("id", "name", "v"))

      Seq((3L, "z")).toDF("id", "name")
        .coalesce(1).write.mode("overwrite").parquet(s"$src/bad")
      val e = intercept[IllegalArgumentException] {
        CopyInto.run(spark, tbl, s"$src/bad")
      }
      assert(e.getMessage.contains("lacks table columns"))
      // the refused run loaded nothing and recorded nothing: fixing the
      // file re-loads it
      assert(DeltaTable.forPath(spark, tbl).toDF.count() == 2)
    }}
  }

  test("a SINGLE file lacking a table column refuses even when a sibling " +
      "carries it (per-footer check, not merged-schema)") {
    withTempDir { tbl => withTempDir { src =>
      DeltaTable.write(Seq((1L, 9L)).toDF("id", "amount"), tbl)
      // f1 has both columns; f2 lacks 'amount' — the merged/sampled
      // schema contains 'amount', so only a per-file footer check can
      // refuse the silent null-fill of f2's rows
      Seq((2L, 8L)).toDF("id", "amount")
        .coalesce(1).write.mode("overwrite").parquet(s"$src/st1")
      Seq(3L).toDF("id")
        .coalesce(1).write.mode("overwrite").parquet(s"$src/st2")
      def mv(from: String, name: String): Unit = {
        val part = new java.io.File(from).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.move(part.toPath, Paths.get(src, name))
      }
      mv(s"$src/st1", "f1.parquet")
      mv(s"$src/st2", "f2.parquet")
      val e = intercept[IllegalArgumentException] {
        CopyInto.run(spark, tbl, src, pattern = Some("f*.parquet"))
      }
      assert(e.getMessage.contains("null-fill"), e.getMessage)
      assert(DeltaTable.forPath(spark, tbl).toDF.count() == 1,
        "the refused run must load nothing")
    }}
  }

  test("hidden files and directories are skipped; empty listing refuses") {
    withTempDir { tbl => withTempDir { src =>
      DeltaTable.write(Seq.empty[(Long, Long)].toDF("id", "v"), tbl)
      stage(src, "a.parquet", 0 until 5)
      Files.createDirectory(Paths.get(src, "_spark_metadata"))
      Files.writeString(Paths.get(src, "_SUCCESS"), "")
      Files.writeString(Paths.get(src, ".hidden.parquet"), "not parquet")
      val r = CopyInto.run(spark, tbl, src)
      assert(r.filesLoaded == 1 && r.rowsLoaded == 5)

      val e = intercept[IllegalArgumentException] {
        CopyInto.run(spark, tbl, src, pattern = Some("*.json"))
      }
      assert(e.getMessage.contains("no data files"))
    }}
  }

  test("4-thread race on the same source loads every file exactly once") {
    withTempDir { tbl => withTempDir { src =>
      DeltaTable.write(Seq.empty[(Long, Long)].toDF("id", "v"), tbl)
      stage(src, "a.parquet", 0 until 40)
      stage(src, "b.parquet", 40 until 70)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        val results = (1 to 4).map { _ =>
          pool.submit(new java.util.concurrent.Callable[CopyInto.CopyResult] {
            def call(): CopyInto.CopyResult = CopyInto.run(spark, tbl, src)
          })
        }.map(_.get())
        // however the race resolved, the UNION of loads is exactly the
        // two files, each once
        assert(results.map(_.filesLoaded).sum == 2,
          s"per-thread loads: ${results.map(_.filesLoaded)}")
        assert(DeltaTable.forPath(spark, tbl).toDF.count() == 70)
        assert(DeltaTable.forPath(spark, tbl).toDF
          .agg(sum("id")).as[Long].head == (0L until 70).sum)
      } finally pool.shutdown()
    }}
  }

  test("COPY INTO commits are append-only and survive checkpoint replay") {
    withTempDir { tbl => withTempDir { src =>
      DeltaTable.write(Seq.empty[(Long, Long)].toDF("id", "v"), tbl)
      stage(src, "a.parquet", 0 until 10)
      CopyInto.run(spark, tbl, src)
      val log = DeltaLog.forTable(spark, tbl)
      val info = log.getCommitInfoAt(log.update().version)
      assert(info.operation.contains("COPY INTO"))
      assert(info.isBlindAppend.contains(true))

      // checkpoint, drop the cache, re-read: the per-file tracking is
      // table state, not session state
      Checkpoints.writeCheckpoint(log.update())
      DeltaLog.clearCache()
      val r = CopyInto.run(spark, tbl, src)
      assert(r.filesLoaded == 0 && r.filesSkipped == 1)
    }}
  }
}
