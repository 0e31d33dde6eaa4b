package graft.delta

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.delta.dv.{DeletionVectors, RoaringBitmapArray, Z85}

/** Deletion-vector READS (PROTOCOL.md "Deletion Vectors"): descriptors on
  * AddFile locate a serialized roaring bitmap of deleted row positions,
  * applied at scan as a (file, row_index) anti-filter. The byte-level
  * tests pin our codec to the PUBLISHED formats (Z85 reference vector,
  * hand-built RoaringFormatSpec layouts) rather than to our own writer,
  * so reader and writer cannot be wrong together. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- Z85
  test("Z85 encodes the published reference vector") {
    val bytes =
      Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b).map(_.toByte)
    assert(Z85.encode(bytes) == "HelloWorld")
    assert(Z85.decode("HelloWorld", 8).toSeq == bytes.toSeq)
  }

  test("Z85 zero-pads the tail and truncates it back") {
    val bytes = Array[Byte](1, 2, 3, 4, 5)
    val enc = Z85.encode(bytes)
    assert(enc.length == 10) // padded to 8 bytes -> 2 groups
    assert(Z85.decode(enc, 5).toSeq == bytes.toSeq)
  }

  test("Z85 uuid round trip is 20 chars") {
    val u = java.util.UUID.fromString("00112233-4455-6677-8899-aabbccddeeff")
    val enc = Z85.encodeUuid(u)
    assert(enc.length == 20)
    assert(Z85.decodeUuid(enc) == u)
  }

  // ----------------------------------------------- roaring, golden bytes
  test("portable serialization matches a hand-built RoaringFormatSpec layout") {
    // values 1, 2 (key 0) and 100000 = 1*2^16 + 34464 (key 1): one 32-bit
    // bitmap, two array containers
    val bm = RoaringBitmapArray(1L, 2L, 100000L)
    val expected = ByteBuffer.allocate(4 + 8 + (4 + 4 + 8 + 8 + 6))
      .order(ByteOrder.LITTLE_ENDIAN)
    expected.putInt(1681511377) // portable magic
    expected.putLong(1L) // one 32-bit bitmap
    expected.putInt(12346) // SERIAL_COOKIE_NO_RUNCONTAINER
    expected.putInt(2) // two containers
    expected.putShort(0); expected.putShort(1) // key 0, cardinality-1 = 1
    expected.putShort(1); expected.putShort(0) // key 1, cardinality-1 = 0
    expected.putInt(24); expected.putInt(28) // container offsets
    expected.putShort(1); expected.putShort(2) // container 0: values 1, 2
    expected.putShort(34464.toShort) // container 1: value 34464
    assert(bm.serialize().toSeq == expected.array().toSeq)
    val back = RoaringBitmapArray.deserialize(expected.array())
    assert(back.values.toSeq == Seq(1L, 2L, 100000L))
    assert(back.cardinality == 3L)
  }

  test("run containers deserialize (foreign run-compressed writers)") {
    // hand-built: cookie 12347 with size 1, run flag set, one run [5, 9]
    val bb = ByteBuffer.allocate(4 + 8 + (4 + 1 + 4 + 2 + 4))
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1681511377)
    bb.putLong(1L)
    bb.putInt(12347) // SERIAL_COOKIE, (size-1)=0 in the high bits
    bb.put(1.toByte) // run-flag bitset: container 0 is a run container
    bb.putShort(0); bb.putShort(4) // key 0, cardinality-1 = 4
    // size 1 < 4 => NO offset header with the run cookie
    bb.putShort(1) // one run
    bb.putShort(5); bb.putShort(4) // start 5, length 4 => 5..9
    val bm = RoaringBitmapArray.deserialize(bb.array())
    assert(bm.values.toSeq == Seq(5L, 6L, 7L, 8L, 9L))
    assert(bm.contains(7L) && !bm.contains(10L))
  }

  test("a run overflowing the 16-bit container space is refused, not " +
      "silently truncated into the wrong row positions") {
    // same layout as above but run [65000, +1000] reaches 66000 — values
    // past 0xFFFF would wrap through toShort on re-serialization and
    // shade the WRONG rows; the parse must fail loudly instead
    val bb = ByteBuffer.allocate(4 + 8 + (4 + 1 + 4 + 2 + 4))
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1681511377)
    bb.putLong(1L)
    bb.putInt(12347)
    bb.put(1.toByte)
    bb.putShort(0); bb.putShort(1000)
    bb.putShort(1)
    bb.putShort(65000.toShort); bb.putShort(1000)
    val e = intercept[IllegalArgumentException] {
      RoaringBitmapArray.deserialize(bb.array())
    }
    assert(e.getMessage.contains("16-bit"), e.getMessage)
  }

  test("bitmap containers round-trip above 4096 cardinality") {
    val values = (0 until 5000).map(i => i.toLong * 2)
    val bm = RoaringBitmapArray(values: _*)
    val back = RoaringBitmapArray.deserialize(bm.serialize())
    assert(back.cardinality == 5000L)
    assert(back.values.toSeq == values)
    assert(back.contains(4998L) && !back.contains(4999L))
  }

  test("values above 2^32 land in later bitmaps") {
    val big = (1L << 32) + 5L
    val bm = RoaringBitmapArray(7L, big)
    val back = RoaringBitmapArray.deserialize(bm.serialize())
    assert(back.values.toSeq == Seq(7L, big))
    assert(back.contains(big) && !back.contains((1L << 32) + 4L))
  }

  // ------------------------------------------------------ file framing
  test("on-disk DV framing: offsets, sizes and CRC round trip; corruption detected") {
    withTempDir { dir =>
      val table = new org.apache.hadoop.fs.Path(dir)
      val conf = spark.sessionState.newHadoopConf()
      val bms = Seq(RoaringBitmapArray(1L, 3L), RoaringBitmapArray(0L, 2L, 4L))
      val descs = DeletionVectors.writeDvFile(table, conf, bms)
      assert(descs.map(_.cardinality) == Seq(2L, 3L))
      assert(descs.head.offset.contains(1)) // after the version byte
      descs.zip(bms).foreach { case (d, bm) =>
        val read = DeletionVectors.readBitmap(d, table, conf)
        assert(read.values.toSeq == bm.values.toSeq)
      }
      // flip one bitmap byte -> the CRC must catch it
      val p = DeletionVectors.absolutePath(descs.head, table)
      val f = new java.io.File(p.toUri.getPath)
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      bytes(descs.head.offset.get + 4 + 2) =
        (bytes(descs.head.offset.get + 4 + 2) ^ 0x1).toByte
      java.nio.file.Files.write(f.toPath, bytes)
      // drop Hadoop's local-FS .crc sidecar so the PROTOCOL's CRC (the one
      // that exists on object stores) is the check that fires
      new java.io.File(f.getParentFile, s".${f.getName}.crc").delete()
      val e = intercept[IllegalArgumentException] {
        DeletionVectors.readBitmap(descs.head, table, conf)
      }
      assert(e.getMessage.contains("CRC"))
    }
  }

  // -------------------------------------------------------- end to end
  /** One commit that shades `pick`ed file with a DV over `positions`:
    * protocol bump to table features + remove(path, oldDv) + add(path,
    * newDv) — the add deliberately listed FIRST so path-only replay
    * keying would fold the pair wrong (the (path, dvId) key is what makes
    * the order irrelevant). */
  private def attachDv(dir: String, positions: Seq[Long], inline: Boolean,
                       pick: Seq[AddFile] => AddFile = _.head): Unit = {
    val log = DeltaLog.forTable(spark, dir)
    val snap = log.update()
    val add = pick(snap.allFiles)
    val bm = RoaringBitmapArray(positions: _*)
    val dv =
      if (inline) DeletionVectors.inline(bm)
      else DeletionVectors.writeDvFile(log.dataPath, log.hadoopConf, Seq(bm)).head
    val actions: Seq[Action] = Seq(
      Protocol(minReaderVersion = 3, minWriterVersion = 7,
        readerFeatures = Some(Seq("deletionVectors")),
        writerFeatures = Some(Seq("deletionVectors"))),
      add.copy(deletionVector = Some(dv), dataChange = true),
      add.remove(dataChange = true)) // carries the PREVIOUS dv (or none)
    val v = snap.version + 1
    log.store.write(FileNames.deltaFile(log.logPath, v),
      actions.map(JsonCodec.toJson).iterator, overwrite = false,
      log.hadoopConf)
  }

  /** A one-file table whose row position EQUALS its id (0..n-1). */
  private def seedTable(dir: String, n: Int): Unit =
    DeltaTable.write(
      (0 until n).map(_.toLong).toDF("id")
        .repartition(1).sortWithinPartitions("id"),
      dir)

  test("inline DV hides exactly the deleted positions") {
    withTempDir { dir =>
      seedTable(dir, 10)
      attachDv(dir, Seq(2L, 5L), inline = true)
      val got = DeltaTable.forPath(spark, dir).toDF
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == Seq(0L, 1L, 3L, 4L, 6L, 7L, 8L, 9L))
    }
  }

  test("uuid-file DV + update: replay keys by (path, dvId), newest bitmap wins") {
    withTempDir { dir =>
      seedTable(dir, 8)
      attachDv(dir, Seq(1L), inline = false)
      val afterFirst = DeltaTable.forPath(spark, dir).toDF
        .select("id").as[Long].collect().sorted.toSeq
      assert(afterFirst == Seq(0L, 2L, 3L, 4L, 5L, 6L, 7L))
      // grow the DV: remove(path, dv1) + add(path, dv2) in ONE commit
      attachDv(dir, Seq(1L, 3L, 6L), inline = false)
      val afterSecond = DeltaTable.forPath(spark, dir).toDF
        .select("id").as[Long].collect().sorted.toSeq
      assert(afterSecond == Seq(0L, 2L, 4L, 5L, 7L))
      // the distributed fold agrees (same (path, dvId) keying)
      val snap = DeltaLog.forTable(spark, dir).update()
      val dist = snap.allFilesDistributed.collect()
      assert(dist.length == 1 && dist.head.deletionVector.exists(_.cardinality == 3))
    }
  }

  test("DV on one file of a partitioned table leaves other partitions whole") {
    withTempDir { dir =>
      val df = (0 until 6).map(i => (i.toLong, if (i < 3) "a" else "b"))
        .toDF("id", "p").repartition(1).sortWithinPartitions("p", "id")
      DeltaTable.write(df, dir, partitionBy = Seq("p"))
      // delete position 0 of partition a's file (id 0)
      attachDv(dir, Seq(0L), inline = true,
        pick = _.find(_.partitionValues("p") == "a").get)
      val got = DeltaTable.forPath(spark, dir).toDF
        .select("id", "p").as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(got == Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "b")))
    }
  }

  test("checkpoint preserves descriptors; distributed state filters too") {
    withTempDir { dir =>
      seedTable(dir, 6)
      attachDv(dir, Seq(0L, 4L), inline = false)
      val log = DeltaLog.forTable(spark, dir)
      Checkpoints.writeCheckpoint(log.update())
      DeltaLog.clearCache()
      // state now replays from the checkpoint alone (it is the newest
      // version); descriptors must have survived the parquet round trip
      val viaCheckpoint = DeltaTable.forPath(spark, dir).toDF
        .select("id").as[Long].collect().sorted.toSeq
      assert(viaCheckpoint == Seq(1L, 2L, 3L, 5L))
      // force the distributed-state path through the same checkpoint
      DeltaLog.clearCache()
      spark.conf.set(Snapshot.DriverStateMaxBytesKey, "0")
      try {
        val snap = DeltaLog.forTable(spark, dir).update()
        assert(snap.distributedState)
        val got = DeltaTable.forPath(spark, dir).toDF
          .select("id").as[Long].collect().sorted.toSeq
        assert(got == Seq(1L, 2L, 3L, 5L))
      } finally {
        spark.conf.unset(Snapshot.DriverStateMaxBytesKey)
        DeltaLog.clearCache()
      }
    }
  }

  test("time travel before the DV still sees every row") {
    withTempDir { dir =>
      seedTable(dir, 5)
      attachDv(dir, Seq(2L), inline = true)
      val log = DeltaLog.forTable(spark, dir)
      val v0 = log.getSnapshotForVersionAsOf(0)
      val all = new graft.delta.read.DeltaScanBuilder(v0).buildDF(None)
        .select("id").as[Long].collect().sorted.toSeq
      assert(all == Seq(0L, 1L, 2L, 3L, 4L))
      val now = DeltaTable.forPath(spark, dir).toDF
        .select("id").as[Long].collect().sorted.toSeq
      assert(now == Seq(0L, 1L, 3L, 4L))
    }
  }

  test("streaming: snapshot excludes deleted rows; ignoreChanges re-emits minus the new DV") {
    withTempDir { dir =>
      seedTable(dir, 8)
      attachDv(dir, Seq(1L), inline = true)
      val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
      val q = spark.readStream.format("graft-delta")
        .option("ignoreChanges", "true").load(dir)
        .writeStream
        .option("checkpointLocation", s"$dir/_ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          seen.synchronized {
            seen += ((id, batch.select("id").as[Long].collect().sorted.toSeq))
          }
          ()
        }
        .start()
      try {
        q.processAllAvailable()
        val initial = seen.synchronized(seen.flatMap(_._2).sorted.toSeq)
        assert(initial == Seq(0L, 2L, 3L, 4L, 5L, 6L, 7L),
          s"initial snapshot must not resurrect DV-deleted rows: $initial")
        // mid-stream DV growth: under ignoreChanges the rewritten file
        // re-emits MINUS its (new) deletion vector
        attachDv(dir, Seq(1L, 3L, 6L), inline = false)
        q.processAllAvailable()
        val reEmitted = seen.synchronized(
          seen.drop(1).flatMap(_._2).sorted.toSeq)
        assert(reEmitted == Seq(0L, 2L, 4L, 5L, 7L),
          s"re-emitted file must exclude the new DV positions: $reEmitted")
      } finally q.stop()
    }
  }

  test("appends to a DV table work; unknown writer features still refuse by name") {
    withTempDir { dir =>
      seedTable(dir, 4)
      attachDv(dir, Seq(1L), inline = true)
      // deletionVectors is now a SUPPORTED writer feature: plain appends
      // are protocol-legal and must not disturb the shade
      DeltaTable.write(Seq(99L).toDF("id"), dir)
      val got = DeltaTable.forPath(spark, dir).toDF
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == Seq(0L, 2L, 3L, 99L))
      // a genuinely unimplemented feature still refuses, naming itself
      val log = DeltaLog.forTable(spark, dir)
      val v = log.update().version + 1
      val protoUp: Seq[Action] = Seq(
        Protocol(minReaderVersion = 3, minWriterVersion = 7,
          readerFeatures = Some(Seq("deletionVectors")),
          writerFeatures = Some(Seq("deletionVectors", "icebergCompatV2"))))
      log.store.write(FileNames.deltaFile(log.logPath, v),
        protoUp.map(JsonCodec.toJson).iterator,
        overwrite = false, log.hadoopConf)
      val e = intercept[IllegalArgumentException] {
        DeltaTable.write(Seq(100L).toDF("id"), dir)
      }
      assert(e.getMessage.contains("icebergCompatV2"), e.getMessage)
    }
  }

  // ------------------------------------------- bulk builder / union (r15)
  test("fromUnsorted equals incremental add across container shapes") {
    val rnd = new scala.util.Random(42)
    // spans array containers, a dense bitmap container, two 32-bit
    // bitmaps, duplicates, and unsorted order
    val values: Array[Long] =
      (rnd.shuffle((100000L to 170000L by 1L).toVector).take(50000) ++
        Seq(0L, 1L, 65535L, 65536L, (1L << 32) + 5, (1L << 32) + 5,
          (3L << 32) | 0xffffL) ++
        (0 until 500).map(_ => rnd.nextLong(1L << 40))).toArray
    val bulk = RoaringBitmapArray.fromUnsorted(values)
    val incr = RoaringBitmapArray.empty()
    values.foreach(incr.add)
    assert(bulk.serialize().toSeq == incr.serialize().toSeq)
    assert(bulk.cardinality == values.distinct.length)
  }

  test("union equals element-wise add and keeps serialized form canonical") {
    val rnd = new scala.util.Random(7)
    val a = Array.fill(20000)(rnd.nextLong(1L << 20))
    val b = Array.fill(20000)(rnd.nextLong(1L << 36))
    val u = RoaringBitmapArray.fromUnsorted(a)
    u.union(RoaringBitmapArray.fromUnsorted(b))
    val ref = RoaringBitmapArray.fromUnsorted(a ++ b)
    assert(u.serialize().toSeq == ref.serialize().toSeq)
    // disjoint-high-bitmap union grows the array without trailing gaps
    val lo = RoaringBitmapArray(1L, 2L)
    lo.union(RoaringBitmapArray((5L << 32) | 9L))
    assert(lo.contains((5L << 32) | 9L) && lo.contains(1L))
    assert(RoaringBitmapArray.deserialize(lo.serialize()).cardinality == 3L)
  }
}
