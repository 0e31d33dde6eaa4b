package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** In-commit timestamps (PROTOCOL.md "In-Commit Timestamps", writer
  * feature inCommitTimestamp): commits record a monotonic timestamp in
  * their CommitInfo; timestamp queries use IT, never file modification
  * times, from the enablement version on. */
class InCommitTimestampSpec extends SparkSpec {
  import spark.implicits._

  private val ictConf = Map("delta.enableInCommitTimestamps" -> "true")

  private def icts(log: DeltaLog): Seq[(Long, Option[Long])] =
    (0L to log.update().version).map(v =>
      (v, log.getCommitInfoAt(v).inCommitTimestamp))

  test("ICT-enabled table stamps monotonic timestamps; backwards clock never regresses") {
    withTempDir { dir =>
      val log = DeltaLog.forTable(spark, dir)
      log.clock = () => 5000L
      DeltaTable.write((0 until 5).toDF("id"), dir, configuration = ictConf)
      log.clock = () => 1000L // wall clock jumps BACK
      DeltaTable.write((5 until 10).toDF("id"), dir)
      log.clock = () => 9000L
      DeltaTable.write((10 until 15).toDF("id"), dir)

      val stamps = icts(log)
      assert(stamps.forall(_._2.isDefined), s"every commit records an ICT: $stamps")
      val values = stamps.map(_._2.get)
      assert(values == values.sorted && values.distinct == values,
        s"ICTs must be strictly increasing: $values")
      assert(values.head == 5000L)
      assert(values(1) == 5001L, "backwards clock lands at predecessor + 1")
      assert(values(2) == 9000L)
      // protocol carries the writer feature; reader version untouched
      val p = log.update().protocol
      assert(p.minWriterVersion == 7 &&
        p.writerFeatures.get.contains("inCommitTimestamp"))
      assert(p.minReaderVersion == 1)
    }
  }

  test("enabling on an existing table stamps enablement version + timestamp") {
    withTempDir { dir =>
      DeltaTable.write((0 until 5).toDF("id"), dir)
      DeltaTable.write((5 until 10).toDF("id"), dir)
      val log = DeltaLog.forTable(spark, dir)
      assert(icts(log).forall(_._2.isEmpty))

      val txn = log.startTransaction()
      txn.updateMetadata(log.metadata.copy(configuration =
        log.metadata.configuration + ("delta.enableInCommitTimestamps" -> "true")))
      val v = txn.commit(Nil, "SET TBLPROPERTIES")
      assert(v == 2)
      val meta = log.update().metadata
      assert(meta.configuration(DeltaConfigs.IctEnablementVersionKey) == "2")
      val ict2 = log.getCommitInfoAt(2).inCommitTimestamp.get
      assert(meta.configuration(DeltaConfigs.IctEnablementTimestampKey)
        == ict2.toString)
      val p = log.update().protocol
      assert(p.writerFeatures.get.contains("inCommitTimestamp"))
      // later commits keep stamping
      DeltaTable.write((10 until 15).toDF("id"), dir)
      assert(log.getCommitInfoAt(3).inCommitTimestamp.exists(_ > ict2))
    }
  }

  test("timestamp time travel and history read ICT, not file mtimes") {
    withTempDir { dir =>
      val log = DeltaLog.forTable(spark, dir)
      // ICTs far in the future — real file mtimes are 'now', so agreement
      // with the query below proves the ICTs are what's being read
      val t0 = System.currentTimeMillis() + 500L * 24 * 3600 * 1000
      log.clock = () => t0
      DeltaTable.write((0 until 5).toDF("id"), dir, configuration = ictConf)
      log.clock = () => t0 + 60000
      DeltaTable.write((5 until 10).toDF("id"), dir)

      assert(log.getSnapshotForTimestampAsOf(t0).version == 0)
      assert(log.getSnapshotForTimestampAsOf(t0 + 59999).version == 0)
      assert(log.getSnapshotForTimestampAsOf(t0 + 60000).version == 1)
      val hist = DeltaTable.forPath(spark, dir).history()
        .select("version", "timestamp").as[(Long, Long)].collect().toMap
      assert(hist(0L) == t0 && hist(1L) == t0 + 60000)
    }
  }

  test("racing commits under a frozen clock stay strictly monotonic") {
    withTempDir { dir =>
      val log = DeltaLog.forTable(spark, dir)
      log.clock = () => 7777L // frozen: ordering must come from the floor
      DeltaTable.write((0 until 2).toDF("id"), dir, configuration = ictConf)
      val threads = (0 until 4).map { i =>
        new Thread(() => {
          DeltaTable.write(Seq(100 + i).toDF("id"), dir)
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val values = icts(log).map(_._2.get)
      assert(values == values.sorted && values.distinct == values,
        s"racing ICTs must still be strictly increasing: $values")
    }
  }
}
