package graft.delta

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming sink writes exactly-once with SetTransaction idempotence") {
    withTempDir { base =>
      val table = s"$base/table"
      val checkpoint = s"$base/ckpt"
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Int]
      input.addData(1 to 10: _*)
      val q = input.toDF().withColumn("doubled", $"value" * 2)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start(table)
      q.awaitTermination(60000)

      val t = DeltaTable.forPath(spark, table)
      assert(t.toDF.count() == 10)
      assert(t.toDF.agg(sum($"doubled")).as[Long].head() == 110)
      // the commit is marked as a streaming update with a txn action
      val log = DeltaLog.forTable(spark, table)
      assert(log.snapshot.setTransactions.nonEmpty)

      // restart from same checkpoint with more data → appends once
      input.addData(11 to 15: _*)
      val q2 = input.toDF().withColumn("doubled", $"value" * 2)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start(table)
      q2.awaitTermination(60000)
      assert(DeltaTable.forPath(spark, table).toDF.count() == 15)
    }
  }

  test("sink replay of an already-committed batch is a no-op") {
    withTempDir { base =>
      val table = s"$base/table"
      val df = (1 to 5).toDF("value")
      val sink = new streaming.DeltaSink(spark.sqlContext, table, Nil,
        org.apache.spark.sql.streaming.OutputMode.Append(),
        Map("txnAppId" -> "test-app"))
      sink.addBatch(0, df)
      sink.addBatch(0, df) // replay after simulated failure
      assert(DeltaTable.forPath(spark, table).toDF.count() == 5)
      sink.addBatch(1, df)
      assert(DeltaTable.forPath(spark, table).toDF.count() == 10)
    }
  }

  test("two sinks WITHOUT txnAppId/queryId never skip each other's batches") {
    withTempDir { base =>
      val table = s"$base/table"
      // two distinct queries (fresh checkpoints) at different batch ids:
      // a shared fallback id (e.g. the table path) would make B's batch 0
      // read as "already committed" after A's batch 57 — silent loss
      val a = new streaming.DeltaSink(spark.sqlContext, table, Nil,
        org.apache.spark.sql.streaming.OutputMode.Append(), Map.empty)
      val b = new streaming.DeltaSink(spark.sqlContext, table, Nil,
        org.apache.spark.sql.streaming.OutputMode.Append(), Map.empty)
      a.addBatch(57, (1 to 5).toDF("value"))
      b.addBatch(0, (6 to 8).toDF("value"))
      assert(DeltaTable.forPath(spark, table).toDF.count() == 8)
      // each sink still skips ITS OWN replays
      b.addBatch(0, (6 to 8).toDF("value"))
      assert(DeltaTable.forPath(spark, table).toDF.count() == 8)
    }
  }

  test("a property-only metadata change does NOT kill the stream; a " +
      "schema change still does") {
    withTempDir { base =>
      val table = s"$base/table"
      val ckpt = s"$base/ckpt"
      DeltaTable.write((1 to 5).toDF("value"), table)
      DeltaTable.forPath(spark, table)
        .setProperties(Map("delta.logRetentionDuration" -> "interval 14 days"))
      DeltaTable.write((6 to 9).toDF("value"), table)
      val q = spark.readStream.format("graft-delta")
        .option("startingVersion", "1") // the property commit is v1
        .load(table)
        .writeStream.format("memory").queryName("prop_ok")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(spark.table("prop_ok").count() == 4,
        "the property-only change must pass through")
      // a REAL schema change still fails a stream pinned BEFORE it: the
      // source is constructed first, the change lands, the next batch
      // throws (eagerly, in changedFiles — before any frame exists)
      val source = new streaming.DeltaSource(spark.sqlContext,
        DeltaLog.forTable(spark, table), Map("startingVersion" -> "1"))
      DeltaTable.write((1 to 2).map(i => (i + 100, s"n$i"))
        .toDF("value", "name"), table)
      val head2 = DeltaLog.forTable(spark, table).update().version
      import org.apache.spark.sql.execution.streaming.runtime.LongOffset
      val e = intercept[UnsupportedOperationException] {
        source.getBatch(None, LongOffset(head2))
      }
      assert(e.getMessage.contains("schema/metadata change"), e.getMessage)
    }
  }

  test("a schema change BETWEEN stream start and the initial-snapshot " +
      "batch fails loudly instead of serving the stale schema forever") {
    withTempDir { base =>
      val table = s"$base/table"
      DeltaTable.write((1 to 5).toDF("value"), table)
      val source = new streaming.DeltaSource(spark.sqlContext,
        DeltaLog.forTable(spark, table), Map.empty) // initial snapshot mode
      // schema evolves AFTER construction but BEFORE the first batch
      DeltaTable.write(Seq((100, "x")).toDF("value", "name"), table)
      val head = DeltaLog.forTable(spark, table).update().version
      import org.apache.spark.sql.execution.streaming.runtime.LongOffset
      val e = intercept[UnsupportedOperationException] {
        source.getBatch(None, LongOffset(head))
      }
      assert(e.getMessage.contains("initial snapshot"), e.getMessage)
    }
  }

  test("streaming source feeds appended versions as micro-batches") {
    withTempDir { base =>
      val table = s"$base/table"
      DeltaTable.write((1 to 10).toDF("value"), table)
      val q = spark.readStream.format("graft-delta").load(table)
        .groupBy().agg(count(lit(1)).as("n"), sum($"value").as("s"))
        .writeStream.format("memory").queryName("src_sink")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val r1 = spark.table("src_sink").as[(Long, Long)].head()
      assert(r1 == ((10L, 55L)))

      // new commits are picked up from the recorded offset
      DeltaTable.write((11 to 20).toDF("value"), table)
      val q2 = spark.readStream.format("graft-delta").load(table)
        .writeStream.format("memory").queryName("src_sink2")
        .trigger(Trigger.AvailableNow())
        .start()
      q2.awaitTermination(60000)
      assert(spark.table("src_sink2").count() == 20) // fresh stream: snapshot
    }
  }

  test("maxFilesPerTrigger splits catch-up into multiple micro-batches") {
    withTempDir { base =>
      val table = s"$base/table"
      DeltaTable.write(Seq(1).toDF("value"), table)
      (2 to 4).foreach(i => DeltaTable.write(Seq(i).toDF("value"), table))

      // start from version 0 explicitly so every version flows as changes
      val q = spark.readStream.format("graft-delta")
        .option("startingVersion", "0")
        .option("maxFilesPerTrigger", "1")
        .load(table)
        .writeStream.format("memory").queryName("ratelimited")
        .start()
      try {
        q.processAllAvailable()
        assert(spark.table("ratelimited").as[Int].collect().sorted.toSeq ==
          Seq(1, 2, 3, 4))
        // 4 versions x 1 file with a 1-file budget => at least 4 batches
        val batches = q.recentProgress.count(_.numInputRows > 0)
        assert(batches >= 4, s"expected >=4 rate-limited batches, got $batches")
      } finally q.stop()
    }
  }

  test("maxBytesPerTrigger caps catch-up by commit bytes") {
    withTempDir { base =>
      val table = s"$base/table"
      DeltaTable.write(Seq(1).toDF("value"), table)
      (2 to 4).foreach(i => DeltaTable.write(Seq(i).toDF("value"), table))

      // every commit is one small parquet file (~a few hundred bytes); a
      // 1-byte budget still admits one version per batch (progress rule)
      val q = spark.readStream.format("graft-delta")
        .option("startingVersion", "0")
        .option("maxBytesPerTrigger", "1")
        .load(table)
        .writeStream.format("memory").queryName("bytelimited")
        .start()
      try {
        q.processAllAvailable()
        assert(spark.table("bytelimited").as[Int].collect().sorted.toSeq ==
          Seq(1, 2, 3, 4))
        val batches = q.recentProgress.count(_.numInputRows > 0)
        assert(batches >= 4, s"expected >=4 byte-capped batches, got $batches")
      } finally q.stop()

      // a generous budget ("1g") admits the whole catch-up in one batch
      val q2 = spark.readStream.format("graft-delta")
        .option("startingVersion", "0")
        .option("maxBytesPerTrigger", "1g")
        .load(table)
        .writeStream.format("memory").queryName("bytelimited2")
        .start()
      try {
        q2.processAllAvailable()
        assert(spark.table("bytelimited2").count() == 4)
        val batches = q2.recentProgress.count(_.numInputRows > 0)
        assert(batches == 1, s"expected a single uncapped batch, got $batches")
      } finally q2.stop()
    }
  }

  test("Trigger.AvailableNow drains rate-limited batches then terminates") {
    withTempDir { base =>
      val table = s"$base/table"
      DeltaTable.write(Seq(1).toDF("value"), table)
      (2 to 4).foreach(i => DeltaTable.write(Seq(i).toDF("value"), table))

      val q = spark.readStream.format("graft-delta")
        .option("startingVersion", "0")
        .option("maxFilesPerTrigger", "1")
        .load(table)
        .writeStream.format("memory").queryName("availnow")
        .trigger(Trigger.AvailableNow())
        .start()
      // the source implements SupportsTriggerAvailableNow: the query must
      // drain all four versions in capped batches and stop BY ITSELF
      assert(q.awaitTermination(60000), "AvailableNow query did not terminate")
      assert(spark.table("availnow").as[Int].collect().sorted.toSeq ==
        Seq(1, 2, 3, 4))
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 4,
        s"expected >=4 rate-limited batches, got ${batches.length}")
      assert(batches.forall(_.numInputRows <= 1))
    }
  }

  test("maxFilesPerTrigger caps the first batch after a restart") {
    withTempDir { base =>
      val table = s"$base/table"
      val ckpt = s"$base/ckpt"
      DeltaTable.write(Seq(1).toDF("value"), table)
      val dst = s"$base/dst"
      val q1 = spark.readStream.format("graft-delta")
        .option("startingVersion", "0")
        .option("maxFilesPerTrigger", "1")
        .load(table)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(dst)
      assert(q1.awaitTermination(60000))

      // three more single-file commits arrive while the stream is DOWN
      (2 to 4).foreach(i => DeltaTable.write(Seq(i).toDF("value"), table))
      val q2 = spark.readStream.format("graft-delta")
        .option("startingVersion", "0")
        .option("maxFilesPerTrigger", "1")
        .load(table)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(dst)
      assert(q2.awaitTermination(60000))
      assert(DeltaTable.forPath(spark, dst).toDF
        .as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
      // admission control receives the committed offset, so the catch-up
      // respects the cap: one single-row file per batch, three batches
      val catchUp = q2.recentProgress.filter(_.numInputRows > 0)
      assert(catchUp.length >= 3,
        s"expected >=3 capped catch-up batches, got ${catchUp.length}")
      assert(catchUp.forall(_.numInputRows <= 1),
        "a post-restart batch exceeded maxFilesPerTrigger")
    }
  }

  test("source fails on delete unless ignoreDeletes") {
    withTempDir { base =>
      val table = s"$base/table"
      DeltaTable.write((1 to 10).map(i => (i, s"g${i % 2}")).toDF("value", "grp"),
        table, partitionBy = Seq("grp"))
      val ckpt1 = s"$base/c1"
      val dst = s"$base/dst"
      // stream the initial snapshot, then a delete arrives
      val q = spark.readStream.format("graft-delta").load(table)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", ckpt1)
        .trigger(Trigger.AvailableNow()).start(dst)
      q.awaitTermination(60000)
      assert(DeltaTable.forPath(spark, dst).toDF.count() == 10)
      DeltaTable.forPath(spark, table).deleteWhere($"grp" === "g0")

      val qFail = spark.readStream.format("graft-delta").load(table)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", ckpt1)
        .trigger(Trigger.AvailableNow()).start(dst)
      val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        qFail.awaitTermination()
      }
      assert(failed.getMessage.contains("ignoreDeletes") ||
        Option(failed.cause).exists(_.getMessage.contains("ignoreDeletes")))

      val qOk = spark.readStream.format("graft-delta")
        .option("ignoreDeletes", "true").load(table)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", ckpt1)
        .trigger(Trigger.AvailableNow()).start(dst)
      qOk.awaitTermination(60000)
      // the delete-only commit was skipped: nothing new landed downstream
      assert(DeltaTable.forPath(spark, dst).toDF.count() == 10)
    }
  }

  test("skipChangeCommits skips rewrite AND delete commits") {
    withTempDir { base =>
      val table = s"$base/table"
      DeltaTable.write((1 to 10).map(i => (i, i * 1.0)).toDF("id", "price"),
        table)
      val ckpt = s"$base/c"
      val dst = s"$base/dst"
      val q1 = spark.readStream.format("graft-delta")
        .option("skipChangeCommits", "true").load(table)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(dst)
      q1.awaitTermination(60000)
      assert(DeltaTable.forPath(spark, dst).toDF.count() == 10)

      // a rewrite (UPDATE), a delete, then a fresh append
      DeltaTable.forPath(spark, table)
        .update($"id" === 3, Map("price" -> lit(999.0)))
      DeltaTable.forPath(spark, table).delete($"id" === 4)
      DeltaTable.write(Seq((11, 11.0)).toDF("id", "price"), table)

      val q2 = spark.readStream.format("graft-delta")
        .option("skipChangeCommits", "true").load(table)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(dst)
      q2.awaitTermination(60000)
      val out = DeltaTable.forPath(spark, dst).toDF
        .as[(Int, Double)].collect().toMap
      // only the append landed; neither the rewrite's re-emission nor a
      // failure — and id 3 keeps its ORIGINAL downstream value
      assert(out.size == 11 && out(11) == 11.0, out.toString)
      assert(out(3) == 3.0, "rewrite commit must be skipped, not re-emitted")
    }
  }

  test("end to end: delta source -> transform -> delta sink") {
    withTempDir { base =>
      val src = s"$base/src"
      val dst = s"$base/dst"
      DeltaTable.write((1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "bucket"), src)
      val q = spark.readStream.format("graft-delta").load(src)
        .filter($"bucket" =!= 0)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination(60000)
      val out = DeltaTable.forPath(spark, dst).toDF
      assert(out.count() == (1 to 100).count(_ % 7 != 0))
    }
  }

  test("sink rejects schema-incompatible batches instead of committing them") {
    withTempDir { base =>
      val src = s"$base/src"
      val dst = s"$base/dst"
      DeltaTable.write(Seq((1, "a")).toDF("id", "v"), dst)
      // source has a RETYPED v (int, not string) — the sink must fail
      // the stream, not silently commit unreadable columns
      DeltaTable.write(Seq((2L, 7)).toDF("id", "v"), src)
      val q = spark.readStream.format("graft-delta").load(src)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", s"$base/ckpt")
        .start(dst)
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.stop()
        throw new IllegalStateException("expected the stream to fail")
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(err).exists(_.contains("does not")), err.toString)
      assert(DeltaTable.forPath(spark, dst).toDF.count() == 1)
    }
  }

  test("foreachBatch upsert: idempotent MERGE and write under batch replay") {
    withTempDir { base =>
      val src = s"$base/src"
      val dst = s"$base/dst"
      val ckpt = s"$base/ckpt"
      DeltaTable.write(Seq((1, 10), (2, 20)).toDF("id", "v"), dst)
      DeltaTable.write(Seq((1, 99), (3, 30)).toDF("id", "v"), src)

      // the canonical streaming-upsert pattern: each micro-batch MERGEs
      // into the target, keyed by (queryId, batchId) for exactly-once
      val q = spark.readStream.format("graft-delta").load(src)
        .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                                     batchId: Long) =>
          DeltaTable.forPath(spark, dst)
            .merge(batch, col("t.id") === col("s.id"))
            .whenMatchedUpdate(Map("v" -> col("s.v")))
            .whenNotMatchedInsertAll()
            .withIdempotency("upsert-test", batchId)
            .execute()
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
      assert(DeltaTable.forPath(spark, dst).toDF.as[(Int, Int)].collect().toSet
        == Set((1, 99), (2, 20), (3, 30)))

      // a REPLAY of the same batch (simulated retry) is a no-op
      val before = DeltaTable.forPath(spark, dst).version
      DeltaTable.forPath(spark, dst)
        .merge(Seq((1, 1000)).toDF("id", "v"), col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("v" -> col("s.v")))
        .withIdempotency("upsert-test", 0L)
        .execute()
      assert(DeltaTable.forPath(spark, dst).version == before)
      assert(DeltaTable.forPath(spark, dst).toDF.filter($"id" === 1)
        .select($"v").as[Int].head() == 99)

      // idempotent plain writes follow the same contract
      val v1 = DeltaTable.write(Seq((9, 90)).toDF("id", "v"), dst,
        idempotentTxn = Some(("loader", 5L)))
      val v2 = DeltaTable.write(Seq((9, 90)).toDF("id", "v"), dst,
        idempotentTxn = Some(("loader", 5L)))
      assert(v2 == v1 && DeltaTable.forPath(spark, dst).toDF
        .filter($"id" === 9).count() == 1)
    }
  }

  test("stream-stream interval join across two delta sources") {
    withTempDir { base =>
      val left = s"$base/impressions"
      val right = s"$base/clicks"
      def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
      DeltaTable.write(Seq((1L, ts(0)), (2L, ts(10)), (3L, ts(20)))
        .toDF("ad_id", "imp_ts"), left)
      DeltaTable.write(Seq((1L, ts(2)), (3L, ts(40)))
        .toDF("ad_id", "click_ts"), right)

      val imps = spark.readStream.format("graft-delta").load(left)
        .withWatermark("imp_ts", "1 hour")
      val clicks = spark.readStream.format("graft-delta").load(right)
        .withWatermark("click_ts", "1 hour")
      // clicks attribute to an impression of the same ad within 5 minutes
      val q = imps.alias("imps").join(clicks.alias("clicks"),
          expr("""imps.ad_id = clicks.ad_id AND
                  click_ts BETWEEN imp_ts AND imp_ts + INTERVAL 5 MINUTES"""))
        .select(col("imps.ad_id"))
        .writeStream.format("memory").queryName("attributed")
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable()
        // ad 1 clicked within window; ad 3's click is 20 min late
        assert(spark.table("attributed").as[Long].collect().toSeq == Seq(1L))
      } finally q.stop()
    }
  }

  test("batch read via format with time travel options") {
    withTempDir { base =>
      val table = s"$base/table"
      DeltaTable.write((1 to 5).toDF("value"), table)
      DeltaTable.write((6 to 9).toDF("value"), table)
      assert(spark.read.format("graft-delta").load(table).count() == 9)
      assert(spark.read.format("graft-delta").option("versionAsOf", 0)
        .load(table).count() == 5)
      val df = (10 to 12).toDF("value")
      df.write.format("graft-delta").mode("append").save(table)
      assert(spark.read.format("graft-delta").load(table).count() == 12)
    }
  }

  test("sub-version chunked offsets survive a REAL engine restart " +
      "(mid-commit offset persisted to the offset log, exactly-once rows)") {
    withTempDir { base =>
      val table = s"$base/table"
      val out = s"$base/out"
      val ckpt = s"$base/ckpt"
      // ONE commit with 6 data files: at maxFilesPerTrigger=2 the engine
      // must take 3 micro-batches THROUGH the same version, persisting
      // sub-version offsets in its offset log between them
      DeltaTable.write((1 to 60).toDF("value").repartition(6), table)
      def start() = spark.readStream.format("graft-delta")
        .option("startingVersion", "0")
        .option("maxFilesPerTrigger", "2")
        .load(table)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(Trigger.AvailableNow())
        .start()

      // first run: stop as soon as at least one batch committed — the
      // recovery below then resumes from a MID-VERSION offset
      val q1 = start()
      val deadline = System.currentTimeMillis() + 60000
      while (q1.isActive && q1.recentProgress.length < 1 &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(50)
      }
      q1.stop()
      q1.awaitTermination(60000)

      // the offset log must have persisted a sub-version offset at some
      // point in the drain (unless the stop raced past all 3 batches)
      val fs = new org.apache.hadoop.fs.Path(ckpt)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val offsetDir = new org.apache.hadoop.fs.Path(s"$ckpt/offsets")
      def offsetBodies: Seq[String] = fs.listStatus(offsetDir).toSeq
        .map { st =>
          val in = fs.open(st.getPath)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        }

      // second run: drain to completion from the recovered offset
      val q2 = start()
      q2.awaitTermination(120000)
      assert(offsetBodies.exists(_.contains("\"index\"")),
        "the engine never persisted a sub-version offset — the commit " +
          "was not chunked")

      // exactly-once: every row exactly once across the restart
      val got = spark.read.parquet(out).as[Int].collect().sorted.toSeq
      assert(got == (1 to 60).toSeq,
        s"restart lost or duplicated rows: ${got.size} rows")
    }
  }
}
