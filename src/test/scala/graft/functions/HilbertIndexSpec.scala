package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Hilbert index must be a true Hilbert curve: bijective over the
  * grid and moving exactly one coordinate by exactly one bucket per
  * step — the locality property the clustering layout depends on. */
class HilbertIndexSpec extends SparkSpec {
  import spark.implicits._

  private def walk(bits: Int, n: Int): Seq[Array[Long]] = {
    val side = 1L << bits
    val cells = Seq.fill(n)(0L until side).foldLeft(Seq(Seq.empty[Long])) {
      (acc, r) => acc.flatMap(p => r.map(p :+ _))
    }
    cells.map(_.toArray)
      .sortBy(c => HilbertIndex.index(bits, c))
  }

  test("first-order 2D curve is the classic U") {
    val order = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L))
    assert(order.map { case (a, b) =>
      HilbertIndex.index(1, Array(a, b)) } == Seq(0L, 1L, 2L, 3L))
  }

  test("bijective and unit-step adjacent: 2D x 3 bits and 3D x 2 bits") {
    for ((bits, n) <- Seq((3, 2), (2, 3))) {
      val cells = walk(bits, n)
      val idx = cells.map(c => HilbertIndex.index(bits, c))
      assert(idx == (0L until (1L << (bits.toLong * n))))
      cells.sliding(2).foreach { case Seq(a, b) =>
        val diffs = a.zip(b).map { case (x, y) => math.abs(x - y) }
        assert(diffs.sum == 1 && diffs.max == 1,
          s"non-adjacent step ${a.toSeq} -> ${b.toSeq} (bits=$bits n=$n)")
      case _ =>
      }
    }
  }

  test("codegen path equals the interpreted function; nulls clamp to 0") {
    val df = spark.range(0, 64).select(
      (col("id") / 8).cast("long").as("a"),
      pmod(col("id"), lit(8)).cast("long").as("b"))
    val out = df.select(col("a"), col("b"),
        HilbertIndex(Seq(col("a"), col("b")), 3).as("h"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (a, b, h) =>
      assert(h == HilbertIndex.index(3, Array(a, b)))
    }
    val withNull = spark.sql("SELECT CAST(NULL AS LONG) AS a, 5L AS b")
      .select(HilbertIndex(Seq(col("a"), col("b")), 3).as("h"))
      .as[Long].head()
    assert(withNull == HilbertIndex.index(3, Array(0L, 5L)))
  }

  test("liquid-clustered OPTIMIZE clusters along the curve and skips") {
    import graft.delta._
    withTempDir { dir =>
      DeltaTable.write(
        graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
          .repartition(8), dir)
      val table = DeltaTable.forPath(spark, dir)
      table.setClusteringColumns(Seq("l_orderkey", "l_partkey"))
      val before = table.toDF.count()
      val total = DeltaLog.forTable(spark, dir).update().sizeInBytes
      table.compact(targetFileBytes = total / 8 + 1)
      val snap = DeltaLog.forTable(spark, dir).update()
      assert(snap.toDF.count() == before)
      // the curve layout must make min/max skipping bite on both columns
      val pruned = new read.DeltaFileIndex(spark, snap).listFiles(
        Nil, Seq(read.PartitionUtils.resolveFilter(spark,
          snap.metadata.schema,
          col("l_orderkey") <= 300L && col("l_partkey") <= 500L)))
        .map(_.files.length).sum
      assert(pruned < snap.numOfFiles,
        s"hilbert clustering skipped nothing ($pruned of ${snap.numOfFiles})")
    }
  }
}
