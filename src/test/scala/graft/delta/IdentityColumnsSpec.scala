package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Identity columns (writer 6): machine-assigned on append, unique and
  * step-monotonic with gaps allowed, high-water mark advancing in the
  * same commit so concurrent writers conflict instead of colliding. */
class IdentityColumnsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType)))

  test("appends assign unique increasing values and advance the mark") {
    withTempDir { dir =>
      DeltaTable.create(spark, dir, schema,
        identityColumns = Map("id" -> ((100L, 10L))))
      assert(DeltaLog.forTable(spark, dir).update()
        .protocol.minWriterVersion == 6)

      DeltaTable.write(Seq("a", "b", "c").toDF("v"), dir)
      val table = DeltaTable.forPath(spark, dir)
      val first = table.toDF.select($"id").as[Long].collect().toSeq
      assert(first.size == 3 && first.distinct.size == 3)
      assert(first.forall(v => v >= 100L && (v - 100L) % 10L == 0L),
        first.toString)

      // the mark advanced: the second batch's values are all beyond it
      DeltaTable.write(Seq("d", "e").toDF("v"), dir)
      val all = table.toDF.select($"id", $"v").as[(Long, String)]
        .collect().toMap.map(_.swap)
      assert(all.size == 5)
      val secondMin = Seq("d", "e").map(all(_)).min
      assert(secondMin > first.max,
        s"second batch must start beyond ${first.max}, got $secondMin")
      val hwm = DeltaLog.forTable(spark, dir).update().metadata
        .schema("id").metadata
        .getLong(graft.delta.write.IdentityColumns.HighWaterMarkKey)
      assert(hwm == (first ++ Seq("d", "e").map(all(_))).max)
    }
  }

  test("negative step descends; explicit values reject for ALWAYS") {
    withTempDir { dir =>
      DeltaTable.create(spark, dir, schema,
        identityColumns = Map("id" -> ((0L, -5L))))
      DeltaTable.write(Seq("a", "b").toDF("v"), dir)
      val first = DeltaTable.forPath(spark, dir).toDF
        .select($"id").as[Long].collect().toSeq
      assert(first.forall(v => v <= 0L && v % 5L == 0L), first.toString)
      DeltaTable.write(Seq("c").toDF("v"), dir)
      val third = DeltaTable.forPath(spark, dir).toDF
        .filter($"v" === "c").select($"id").as[Long].head()
      assert(third < first.min, s"$third vs ${first.min}")

      // non-null explicit values abort the write job row-wise
      intercept[Exception] {
        DeltaTable.write(Seq((1L, "x")).toDF("id", "v"), dir)
      }
      // an explicit NULL means "assign" (the SQL null-padding shape)
      DeltaTable.write(
        Seq((Option.empty[java.lang.Long], "n")).toDF("id", "v"), dir)
      assert(DeltaTable.forPath(spark, dir).toDF
        .filter($"v" === "n").select($"id").as[Long].head() < 0L)
    }
  }

  test("concurrent identity appends stay unique (conflict + retry)") {
    withTempDir { dir =>
      DeltaTable.create(spark, dir, schema,
        identityColumns = Map("id" -> ((0L, 1L))))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val failures = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      try {
        val tasks = (1 to 2).map { t =>
          pool.submit(new Runnable {
            def run(): Unit = try {
              (1 to 4).foreach { i =>
                var done = false
                while (!done) {
                  // metadata conflicts surface as concurrent-commit
                  // exceptions — the caller retries with a fresh mark,
                  // which is exactly what keeps values unique
                  try { DeltaTable.write(Seq(s"t$t-$i").toDF("v"), dir); done = true }
                  catch { case _: graft.delta.txn.ConcurrentModificationException => () }
                }
              }
            } catch { case e: Throwable => failures.set(e) }
          })
        }
        tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      } finally pool.shutdown()
      assert(failures.get() == null, s"writer failed: ${failures.get()}")
      val ids = DeltaTable.forPath(spark, dir).toDF
        .select($"id").as[Long].collect().toSeq
      assert(ids.size == 8 && ids.distinct.size == 8,
        s"identity collision: $ids")
    }
  }

  test("MERGE insert and UPDATE on ALWAYS identity are rejected") {
    withTempDir { dir =>
      DeltaTable.create(spark, dir, schema,
        identityColumns = Map("id" -> ((0L, 1L))))
      DeltaTable.write(Seq("a").toDF("v"), dir)
      val table = DeltaTable.forPath(spark, dir)
      intercept[IllegalArgumentException] {
        table.update(lit(true), Map("id" -> lit(99L)))
      }
      intercept[IllegalArgumentException] {
        table.merge(Seq((5L, "z")).toDF("id", "v"),
            col("t.id") === col("s.id"))
          .whenNotMatchedInsertAll()
          .execute()
      }
      // matched UPDATE of a non-identity column is fine
      table.merge(Seq("a").toDF("v2"), col("t.v") === col("s.v2"))
        .whenMatchedUpdate(Map("v" -> lit("a2")))
        .execute()
      assert(table.toDF.select($"v").as[String].head() == "a2")
    }
  }

  test("SQL DDL: GENERATED ALWAYS AS IDENTITY creates and inserts assign") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh-id-").toFile
    spark.conf.set("spark.sql.catalog.graftid", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftid.warehouse", wh.getAbsolutePath)
    spark.sql("""CREATE TABLE graftid.db.idt (
                   id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 7 INCREMENT BY 3),
                   v STRING)""")
    val path = s"${wh.getAbsolutePath}/db/idt"
    val snap = DeltaLog.forTable(spark, path).update()
    assert(snap.protocol.minWriterVersion == 6)
    val meta = snap.metadata.schema("id").metadata
    assert(meta.getLong(graft.delta.write.IdentityColumns.StartKey) == 7L)
    assert(meta.getLong(graft.delta.write.IdentityColumns.StepKey) == 3L)
    // the column-list INSERT omits the identity column; values assign
    spark.sql("INSERT INTO graftid.db.idt (v) VALUES ('a'), ('b')")
    val rows = spark.sql("SELECT id, v FROM graftid.db.idt")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == 2 && rows.map(_._1).distinct.length == 2)
    assert(rows.forall(r => r._1 >= 7L && (r._1 - 7L) % 3L == 0L),
      rows.mkString(", "))
    // explicit values for ALWAYS identity reject
    intercept[Exception] {
      spark.sql("INSERT INTO graftid.db.idt VALUES (1, 'x')")
    }
  }

  test("streaming sink assigns identity values too") {
    withTempDir { base =>
      val src = s"$base/src"
      val dst = s"$base/dst"
      DeltaTable.write(Seq("x", "y", "z").toDF("v"), src)
      DeltaTable.create(spark, dst, schema,
        identityColumns = Map("id" -> ((1000L, 1L))))
      val q = spark.readStream.format("graft-delta").load(src)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination(60000)
      val ids = DeltaTable.forPath(spark, dst).toDF
        .select($"id").as[Long].collect().toSeq
      assert(ids.size == 3 && ids.distinct.size == 3 &&
        ids.forall(_ >= 1000L), ids.toString)
    }
  }
}
