package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: matched rows update, unmatched rows insert") {
    withTempDir { dir =>
      DeltaTable.write((1 to 10).map(i => (i, i * 10.0)).toDF("id", "price"), dir)
      val source = (6 to 15).map(i => (i, i * 100.0)).toDF("id", "price")
      val table = DeltaTable.forPath(spark, dir)
      table.merge(source, col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("price" -> col("s.price")))
        .whenNotMatchedInsertAll()
        .execute()

      val out = table.toDF.as[(Int, Double)].collect().toMap
      assert(out.keySet == (1 to 15).toSet)
      (1 to 5).foreach(i => assert(out(i) == i * 10.0)) // untouched
      (6 to 15).foreach(i => assert(out(i) == i * 100.0)) // updated/inserted
      assert(table.history().filter($"operation" === "MERGE").count() == 1)
    }
  }

  test("whenMatchedDelete removes matched target rows") {
    withTempDir { dir =>
      DeltaTable.write((1 to 10).toDF("id"), dir)
      val table = DeltaTable.forPath(spark, dir)
      table.merge(Seq(2, 4, 6).toDF("id"), col("t.id") === col("s.id"))
        .whenMatchedDelete()
        .execute()
      assert(table.toDF.as[Int].collect().sorted.toSeq ==
        Seq(1, 3, 5, 7, 8, 9, 10))
    }
  }

  test("a target row matched by two source rows is an error") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "x")).toDF("id", "v"), dir)
      val dupSource = Seq((1, "a"), (1, "b")).toDF("id", "v")
      val table = DeltaTable.forPath(spark, dir)
      intercept[IllegalStateException] {
        table.merge(dupSource, col("t.id") === col("s.id"))
          .whenMatchedUpdate(Map("v" -> col("s.v")))
          .execute()
      }
      assert(table.toDF.count() == 1) // nothing committed
    }
  }

  test("merge bounded by a partition conjunct never reads other partitions") {
    withTempDir { dir =>
      DeltaTable.write(
        Seq((1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0))
          .toDF("id", "part", "price"),
        dir, partitionBy = Seq("part"))
      // physically delete partition b's parquet bytes: if the merge's
      // touched-file job or its insert anti-join scanned the whole
      // table, the job would fail with a missing-file error — candidate
      // pruning from the `t.part = 'a'` conjunct is what saves it
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        .forEachRemaining { p =>
          if (p.toString.contains("part=b") && p.toString.endsWith(".parquet"))
            java.nio.file.Files.delete(p)
        }
      val table = DeltaTable.forPath(spark, dir)
      table.merge(
          Seq((2, "a", 200.0), (4, "a", 400.0)).toDF("id", "part", "price"),
          col("t.part") === lit("a") && col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("price" -> col("s.price")))
        .whenNotMatchedInsertAll()
        .execute()
      val a = table.toDF.filter($"part" === "a")
        .select($"id", $"price").as[(Int, Double)].collect().toMap
      assert(a == Map(1 -> 10.0, 2 -> 200.0, 4 -> 400.0), a.toString)
    }
  }

  test("merge with a data-only target conjunct stats-prunes the scan") {
    withTempDir { dir =>
      DeltaTable.write((1 to 10).map(i => (i, i * 1.0)).toDF("id", "price"),
        dir)
      DeltaTable.write((11 to 20).map(i => (i, i * 100.0)).toDF("id", "price"),
        dir)
      // physically delete the low-id file's bytes: the merge condition's
      // `t.price >= 1000` conjunct must stats-skip it (its max price is
      // 10), so the touched-file job never opens it
      val log = DeltaLog.forTable(spark, dir)
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        .forEachRemaining { p =>
          val name = p.getFileName.toString
          if (name.endsWith(".parquet") && !p.toString.contains("_delta_log")) {
            // identify the low file via the log's stats-pruned scan
            val lowPaths = graft.delta.read.DataSkipping
              .filterFiles(log.update().allFiles,
                Seq(graft.delta.read.PartitionUtils.resolveFilter(
                  spark, log.update().metadata.schema, $"price" < 50.0)),
                log.update().metadata.dataSchema)
              .map(_.path)
            if (lowPaths.exists(lp => p.toString.endsWith(
                new java.net.URI(lp).getPath)))
              java.nio.file.Files.delete(p)
          }
        }
      val table = DeltaTable.forPath(spark, dir)
      table.merge(
          Seq((15, 0.0), (16, 0.0)).toDF("id", "price"),
          col("t.id") === col("s.id") && col("t.price") >= lit(1000.0))
        .whenMatchedUpdate(Map("price" -> col("s.price")))
        .execute()
      // read back skipping the deleted file by id stats
      val out = table.toDF.filter($"id" >= 11)
        .as[(Int, Double)].collect().toMap
      assert(out(15) == 0.0 && out(16) == 0.0, out.toString)
      assert(out(12) == 1200.0 && out.size == 10, out.toString)
    }
  }

  test("partition-bounded merges do not conflict with appends to other " +
      "partitions") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, "a", 1.0)).toDF("id", "part", "price"),
        dir, partitionBy = Seq("part"))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      try {
        val merger = pool.submit(new Runnable {
          def run(): Unit = try {
            (1 to 5).foreach { i =>
              DeltaTable.forPath(spark, dir)
                .merge(Seq((1, "a", i * 1.0)).toDF("id", "part", "price"),
                  col("t.part") === lit("a") && col("t.id") === col("s.id"))
                .whenMatchedUpdate(Map("price" -> col("s.price")))
                .execute()
            }
          } catch { case t: Throwable => failure.set(t) }
        })
        val appender = pool.submit(new Runnable {
          def run(): Unit = try {
            (1 to 10).foreach(i =>
              DeltaTable.write(Seq((100 + i, "b", 0.0))
                .toDF("id", "part", "price"), dir))
          } catch { case t: Throwable => failure.set(t) }
        })
        merger.get(120, java.util.concurrent.TimeUnit.SECONDS)
        appender.get(120, java.util.concurrent.TimeUnit.SECONDS)
      } finally pool.shutdown()
      assert(failure.get() == null,
        s"concurrent merge/append failed: ${failure.get()}")
      val out = DeltaTable.forPath(spark, dir).toDF
        .select($"id", $"price").as[(Int, Double)].collect().toMap
      assert(out(1) == 5.0, out.toString)
      assert(out.size == 11)
    }
  }

  test("merge into a not-yet-existing partition inserts all source rows") {
    withTempDir { dir =>
      // the partition conjunct prunes the candidate set to ZERO files —
      // the anti-join runs over an empty scan and everything inserts
      DeltaTable.write(Seq((1, "a", 1.0)).toDF("id", "part", "price"),
        dir, partitionBy = Seq("part"))
      val table = DeltaTable.forPath(spark, dir)
      table.merge(
          Seq((10, "z", 10.0), (11, "z", 11.0)).toDF("id", "part", "price"),
          col("t.part") === lit("z") && col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("price" -> col("s.price")))
        .whenNotMatchedInsertAll()
        .execute()
      val out = table.toDF.select($"id", $"part").as[(Int, String)]
        .collect().toSet
      assert(out == Set((1, "a"), (10, "z"), (11, "z")), out.toString)
    }
  }

  test("ordered conditional clauses: first applicable clause wins") {
    withTempDir { dir =>
      DeltaTable.write(
        (1 to 6).map(i => (i, i * 10.0, "keep")).toDF("id", "price", "status"),
        dir)
      val source = (1 to 8).map(i => (i, i * 100.0)).toDF("id", "price")
      val table = DeltaTable.forPath(spark, dir)
      table.merge(source, col("t.id") === col("s.id"))
        // clause 1: delete cheap matched rows
        .whenMatchedDelete(col("t.price") < 25.0)
        // clause 2: update the rest
        .whenMatchedUpdate(col("s.price") > 350.0,
          Map("price" -> col("s.price"), "status" -> lit("bumped")))
        // matched rows failing both conditions carry unchanged
        .whenNotMatchedInsertAll()
        .execute()
      val out = table.toDF.as[(Int, Double, String)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // ids 1,2 deleted (price 10,20 < 25)
      assert(!out.contains(1) && !out.contains(2), out.toString)
      // ids 4,5,6 updated (source price 400,500,600 > 350)
      assert(out(4) == ((400.0, "bumped")) && out(6) == ((600.0, "bumped")))
      // id 3 matched but NO clause fired (price 30 >= 25, source 300 <= 350)
      assert(out(3) == ((30.0, "keep")), out.toString)
      // ids 7,8 inserted with status null
      assert(out(7)._1 == 700.0 && out(7)._2 == null)
    }
  }

  test("conditional and explicit-values insert clauses") {
    withTempDir { dir =>
      DeltaTable.write(Seq((1, 1.0, "x")).toDF("id", "price", "status"), dir)
      val source = (1 to 4).map(i => (i, i * 100.0)).toDF("id", "price")
      val table = DeltaTable.forPath(spark, dir)
      table.merge(source, col("t.id") === col("s.id"))
        // first clause: big rows insert with explicit values
        .whenNotMatchedInsert(col("s.price") >= 300.0,
          Map("id" -> col("s.id"), "price" -> col("s.price"),
            "status" -> lit("big")))
        // second clause: everything else aligns by name (status null)
        .whenNotMatchedInsertAll()
        .execute()
      val out = table.toDF.as[(Int, Double, String)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(out(1) == ((1.0, "x"))) // matched, no matched clause → carry
      assert(out(2) == ((200.0, null)), out.toString)
      assert(out(3) == ((300.0, "big")) && out(4) == ((400.0, "big")))
    }
  }

  test("insert clause with a false condition drops unmatched rows") {
    withTempDir { dir =>
      DeltaTable.write(Seq(1).toDF("id"), dir)
      val table = DeltaTable.forPath(spark, dir)
      table.merge(Seq(2, 3).toDF("id"), col("t.id") === col("s.id"))
        .whenNotMatchedInsertAll(col("s.id") > 2)
        .execute()
      assert(table.toDF.as[Int].collect().sorted.toSeq == Seq(1, 3))
    }
  }

  test("conditional merge clauses emit typed CDF changes") {
    withTempDir { dir =>
      DeltaTable.write(
        (1 to 4).map(i => (i, i * 10.0)).toDF("id", "price"), dir,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      val table = DeltaTable.forPath(spark, dir)
      table.merge((1 to 5).map(i => (i, i * 100.0)).toDF("id", "price"),
          col("t.id") === col("s.id"))
        .whenMatchedDelete(col("t.id") === 1)
        .whenMatchedUpdate(col("t.id") === 2, Map("price" -> col("s.price")))
        .whenNotMatchedInsertAll()
        .execute()
      val v = table.deltaLog.update().version
      val ch = table.changes(v, v)
        .select($"id", $"_change_type").as[(Int, String)].collect().toSet
      assert(ch.contains((1, "delete")), ch.toString)
      assert(ch.contains((2, "update_preimage")) &&
        ch.contains((2, "update_postimage")), ch.toString)
      assert(ch.contains((5, "insert")), ch.toString)
      // ids 3,4 matched but no clause fired → no change rows
      assert(!ch.exists(_._1 == 3) && !ch.exists(_._1 == 4), ch.toString)
    }
  }

  test("whenNotMatchedBySource updates and deletes unmatched target rows") {
    withTempDir { dir =>
      DeltaTable.write(
        (1 to 6).map(i => (i, i * 10.0, "live")).toDF("id", "price", "status"),
        dir)
      val table = DeltaTable.forPath(spark, dir)
      // source covers ids 1-3 only; 4-6 are not matched by source
      table.merge((1 to 3).map(i => (i, i * 100.0)).toDF("id", "price"),
          col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("price" -> col("s.price")))
        .whenNotMatchedBySourceDelete(col("t.price") > 55.0)
        .whenNotMatchedBySourceUpdate(Map("status" -> lit("stale")))
        .execute()
      val out = table.toDF.as[(Int, Double, String)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // matched rows updated
      assert(out(1) == ((100.0, "live")) && out(3) == ((300.0, "live")))
      // id 6 (price 60 > 55) deleted by the first by-source clause
      assert(!out.contains(6), out.toString)
      // ids 4,5 fall through to the second clause and mark stale
      assert(out(4) == ((40.0, "stale")) && out(5) == ((50.0, "stale")),
        out.toString)
      assert(out.size == 5)
    }
  }

  test("by-source clause conditions stats-prune the rewrite set") {
    withTempDir { dir =>
      // two files with disjoint id ranges; the by-source condition only
      // reaches the high range — the low file must survive unrewritten
      DeltaTable.write((1 to 10).map(i => (i, i * 1.0)).toDF("id", "price")
        .coalesce(1), dir)
      DeltaTable.write((11 to 20).map(i => (i, i * 1.0)).toDF("id", "price")
        .coalesce(1), dir)
      val log = DeltaLog.forTable(spark, dir)
      val beforePaths = log.update().allFiles.map(_.path).toSet
      val table = DeltaTable.forPath(spark, dir)
      table.merge(Seq((15, 0.0)).toDF("id", "price"),
          col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("price" -> col("s.price")))
        .whenNotMatchedBySourceDelete(col("t.id") > 18)
        .execute()
      val afterPaths = log.update().allFiles.map(_.path).toSet
      // only the high file rewrote (both the match and the by-source
      // condition point at it); the low file's AddFile survives
      assert((beforePaths -- afterPaths).size == 1,
        s"rewrote ${(beforePaths -- afterPaths).size} files")
      val out = table.toDF.as[(Int, Double)].collect().toMap
      assert(out(15) == 0.0 && !out.contains(19) && !out.contains(20))
      assert(out.contains(5) && out.size == 18, out.size.toString)
    }
  }

  test("by-source-only merge never duplicates a target row matched by " +
      "several source rows") {
    withTempDir { dir =>
      DeltaTable.write(
        Seq((1, "live"), (2, "live")).toDF("id", "status"), dir)
      val table = DeltaTable.forPath(spark, dir)
      // duplicate source keys are LEGAL here: no matched clause reads
      // source values, so there is nothing nondeterministic — but a
      // naive left join would write id=1 twice
      table.merge(Seq(1, 1, 1).toDF("id"), col("t.id") === col("s.id"))
        .whenNotMatchedBySourceUpdate(Map("status" -> lit("stale")))
        .execute()
      val out = table.toDF.as[(Int, String)].collect().sorted.toSeq
      assert(out == Seq((1, "live"), (2, "stale")), out.toString)
    }
  }

  test("withSchemaEvolution extends the target schema from the source") {
    withTempDir { dir =>
      DeltaTable.write((1 to 3).map(i => (i, i * 10.0)).toDF("id", "price"),
        dir)
      val table = DeltaTable.forPath(spark, dir)
      val source = Seq((2, 200.0, "beta"), (4, 400.0, "new"))
        .toDF("id", "price", "tag")
      table.merge(source, col("t.id") === col("s.id"))
        .withSchemaEvolution()
        .whenMatchedUpdate(Map("price" -> col("s.price"),
          "tag" -> col("s.tag")))
        .whenNotMatchedInsertAll()
        .execute()
      val snap = table.deltaLog.update()
      assert(snap.metadata.schema.fieldNames.toSeq == Seq("id", "price", "tag"))
      val out = table.toDF.as[(Int, Double, Option[String])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // untouched rows read the new column as null
      assert(out(1) == ((10.0, None)) && out(3) == ((30.0, None)))
      assert(out(2) == ((200.0, Some("beta"))))
      assert(out(4) == ((400.0, Some("new"))))
      // without evolution, extra source columns do NOT appear: the
      // by-name insert aligns to the target schema
      table.merge(Seq((5, 500.0, "x", true)).toDF("id", "price", "tag", "extra"),
          col("t.id") === col("s.id"))
        .whenNotMatchedInsertAll()
        .execute()
      assert(table.deltaLog.update().metadata.schema.fieldNames.toSeq ==
        Seq("id", "price", "tag"))
    }
  }

  test("insert-only merge appends exactly the unmatched rows") {
    withTempDir { dir =>
      DeltaTable.write((1 to 5).map(i => (i, s"g${i % 2}")).toDF("id", "grp"),
        dir, partitionBy = Seq("grp"))
      val filesBefore = DeltaLog.forTable(spark, dir).update().allFiles.map(_.path).toSet
      val source = (4 to 8).map(i => (i, s"g${i % 2}")).toDF("id", "grp")
      val table = DeltaTable.forPath(spark, dir)
      table.merge(source, col("t.id") === col("s.id"))
        .whenNotMatchedInsertAll()
        .execute()
      assert(table.toDF.select($"id").as[Int].collect().sorted.toSeq ==
        (1 to 8).toSeq)
      // no target file was rewritten — insert-only merges never remove
      val after = DeltaLog.forTable(spark, dir).update().allFiles.map(_.path).toSet
      assert(filesBefore.subsetOf(after))
    }
  }
}
