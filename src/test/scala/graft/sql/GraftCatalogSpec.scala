package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.delta.{DeltaLog, DeltaTable}

/** The F9 DDL surface: CREATE/ALTER/DROP/RENAME TABLE plus SQL time
  * travel through the DSv2 catalog (`graft.db.t VERSION AS OF n`). */
class GraftCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse =
    Files.createTempDirectory("graft-warehouse-").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new graft.GraftExtensions)
    .master("local[4]")
    .appName("graft-catalog-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.graft.warehouse", warehouse)
    .getOrCreate()

  override def afterAll(): Unit = {
    DeltaLog.clearCache()
    super.afterAll()
  }

  test("SHALLOW CLONE into a catalog identifier lands in the warehouse") {
    spark.sql("""CREATE TABLE graft.db.clone_src (id BIGINT, v STRING)""")
    spark.sql("""INSERT INTO graft.db.clone_src VALUES (1, 'a'), (2, 'b')""")
    spark.sql("CREATE TABLE graft.db.clone_dst SHALLOW CLONE graft.db.clone_src")
    // the clone is immediately visible as a catalog table
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.clone_dst")
      .head().getLong(0) == 2L)
    spark.sql("INSERT INTO graft.db.clone_dst VALUES (3, 'c')")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.clone_dst")
      .head().getLong(0) == 3L)
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.clone_src")
      .head().getLong(0) == 2L)
  }

  test("user TBLPROPERTIES survive CREATE TABLE; reserved keys do not") {
    spark.sql("""CREATE TABLE graft.db.props (id INT)
                 TBLPROPERTIES ('owner.team'='data-eng', 'delta.appendOnly'='false')""")
    val cfg = graft.delta.DeltaLog
      .forTable(spark, s"$warehouse/db/props").update().metadata.configuration
    assert(cfg("owner.team") == "data-eng")
    assert(cfg("delta.appendOnly") == "false")
    assert(!cfg.contains("provider") && !cfg.contains("location"))
  }

  test("ADD COLUMNS honors FIRST and AFTER positions") {
    spark.sql("CREATE TABLE graft.db.pos (a INT, b INT)")
    spark.sql("ALTER TABLE graft.db.pos ADD COLUMNS (z INT FIRST)")
    spark.sql("ALTER TABLE graft.db.pos ADD COLUMNS (m INT AFTER a)")
    val cols = graft.delta.DeltaLog
      .forTable(spark, s"$warehouse/db/pos").update().metadata.schema.fieldNames
    assert(cols.toSeq == Seq("z", "a", "m", "b"), cols.mkString(","))
  }

  test("writeTo append resolves through the V2 path") {
    spark.sql("CREATE TABLE graft.db.wt (id BIGINT, v STRING)")
    spark.range(0, 3).selectExpr("id", "CAST(id AS STRING) AS v")
      .writeTo("graft.db.wt").append()
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.wt").head().getLong(0) == 3L)
  }

  test("CREATE TABLE + INSERT + SELECT through the catalog") {
    spark.sql("""CREATE TABLE graft.db.events
                 (id BIGINT, category STRING, amount DOUBLE)
                 PARTITIONED BY (category)""")
    assert(DeltaTable.isDeltaTable(spark, s"$warehouse/db/events"))
    spark.sql("""INSERT INTO graft.db.events
                 SELECT id, concat('c', CAST(id % 3 AS STRING)), id * 1.5
                 FROM range(0, 30)""")
    val n = spark.sql("SELECT COUNT(*) FROM graft.db.events").head().getLong(0)
    assert(n == 30)
    val byCat = spark.sql("""SELECT category, COUNT(*) AS n
                             FROM graft.db.events GROUP BY category
                             ORDER BY category""").collect()
    assert(byCat.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("c0", 10L), ("c1", 10L), ("c2", 10L)))
    // the log is the schema source of truth; partitioning came from DDL
    val meta = DeltaLog.forTable(spark, s"$warehouse/db/events").update().metadata
    assert(meta.partitionColumns == Seq("category"))
  }

  test("SQL time travel: VERSION AS OF through the catalog") {
    spark.sql("CREATE TABLE graft.db.tt (v INT)")
    spark.sql("INSERT INTO graft.db.tt VALUES (1), (2)")
    spark.sql("INSERT INTO graft.db.tt VALUES (3)")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.tt").head().getLong(0) == 3)
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.tt VERSION AS OF 1")
      .head().getLong(0) == 2)
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.tt VERSION AS OF 0")
      .head().getLong(0) == 0) // CREATE TABLE commit: schema, no data
  }

  test("ALTER TABLE ADD COLUMNS and TBLPROPERTIES are log commits") {
    spark.sql("CREATE TABLE graft.db.alt (id INT)")
    spark.sql("INSERT INTO graft.db.alt VALUES (1)")
    spark.sql("ALTER TABLE graft.db.alt ADD COLUMNS (tag STRING)")
    spark.sql("ALTER TABLE graft.db.alt SET TBLPROPERTIES " +
      "('delta.checkpointInterval' = '5')")
    val meta = DeltaLog.forTable(spark, s"$warehouse/db/alt").update().metadata
    assert(meta.schema.fieldNames.toSeq == Seq("id", "tag"))
    assert(meta.configuration.get("delta.checkpointInterval").contains("5"))
    // pre-evolution rows read back with a null tag
    val rows = spark.sql("SELECT id, tag FROM graft.db.alt").collect()
    assert(rows.map(r => (r.getInt(0), r.isNullAt(1))).toSeq == Seq((1, true)))
    spark.sql("INSERT INTO graft.db.alt VALUES (2, 'x')")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.alt WHERE tag = 'x'")
      .head().getLong(0) == 1)
  }

  test("SHOW TABLES, RENAME and DROP") {
    spark.sql("CREATE TABLE graft.db2.one (v INT)")
    spark.sql("CREATE TABLE graft.db2.two (v INT)")
    val listed = spark.sql("SHOW TABLES IN graft.db2").collect()
      .map(_.getString(1)).toSet
    assert(listed == Set("one", "two"))
    spark.sql("ALTER TABLE graft.db2.one RENAME TO db2.uno")
    assert(spark.sql("SHOW TABLES IN graft.db2").collect()
      .map(_.getString(1)).toSet == Set("uno", "two"))
    spark.sql("DROP TABLE graft.db2.two")
    assert(spark.sql("SHOW TABLES IN graft.db2").collect()
      .map(_.getString(1)).toSet == Set("uno"))
    intercept[Exception] { spark.sql("SELECT * FROM graft.db2.two").collect() }
  }

  test("CREATE TABLE AS SELECT creates then appends transactionally") {
    spark.sql("""CREATE TABLE graft.db.ctas AS
                 SELECT id, id * 2 AS dbl FROM range(0, 10)""")
    assert(spark.sql("SELECT SUM(dbl) FROM graft.db.ctas").head().getLong(0) == 90)
    // both the create and the data are log commits
    val hist = DeltaLog.forTable(spark, s"$warehouse/db/ctas").history()
    assert(hist.nonEmpty)
    assert(DeltaTable.isDeltaTable(spark, s"$warehouse/db/ctas"))
  }

  test("ALTER TABLE RENAME COLUMN is metadata-only; old and new files both decode") {
    spark.sql("CREATE TABLE graft.db.rn (id INT, price DOUBLE)")
    spark.sql("INSERT INTO graft.db.rn VALUES (1, 10.0), (2, 20.0)")
    spark.sql("ALTER TABLE graft.db.rn RENAME COLUMN price TO cost")
    // pre-rename files decode under the new logical name
    assert(spark.sql("SELECT SUM(cost) FROM graft.db.rn").head().getDouble(0) == 30.0)
    // post-rename inserts keep writing the ORIGINAL parquet name
    spark.sql("INSERT INTO graft.db.rn VALUES (3, 30.0)")
    assert(spark.sql("SELECT SUM(cost) FROM graft.db.rn").head().getDouble(0) == 60.0)
    // pushed filters on the renamed column translate to the physical name
    assert(spark.sql("SELECT id FROM graft.db.rn WHERE cost > 15.0 ORDER BY id")
      .collect().map(_.getInt(0)).toSeq == Seq(2, 3))
    val path = s"$warehouse/db/rn"
    val meta = DeltaLog.forTable(spark, path).update().metadata
    assert(meta.columnMapping == Map("cost" -> "price"))
    // the op is recorded with the reference's enum name (Operation.java CHANGE_COLUMN)
    assert(DeltaLog.forTable(spark, path).history().map(_.operation.getOrElse(""))
      .contains("CHANGE COLUMN"))
    // DML through the renamed column rewrites correctly
    val t = DeltaTable.forPath(spark, path)
    t.update(org.apache.spark.sql.functions.col("cost") === 10.0,
      Map("cost" -> org.apache.spark.sql.functions.lit(11.0)))
    assert(spark.sql("SELECT SUM(cost) FROM graft.db.rn").head().getDouble(0) == 61.0)
    // renaming a second time composes (mapping still points at the original)
    spark.sql("ALTER TABLE graft.db.rn RENAME COLUMN cost TO fee")
    assert(spark.sql("SELECT SUM(fee) FROM graft.db.rn").head().getDouble(0) == 61.0)
    assert(DeltaLog.forTable(spark, path).update().metadata.columnMapping ==
      Map("fee" -> "price"))
    // adding a column that reuses the ORIGINAL name gets a FRESH physical
    // name (delta-spark's column-mapping stance): it must neither decode
    // fee's stored bytes (resurrection) nor collide with fee's writes
    spark.sql("ALTER TABLE graft.db.rn ADD COLUMNS (price DOUBLE)")
    val m3 = DeltaLog.forTable(spark, path).update().metadata
    assert(m3.columnMapping("fee") == "price")
    assert(m3.columnMapping.get("price").exists(p =>
      p != "price" && p.startsWith("price-")),
      s"re-added column must bind a fresh physical name: ${m3.columnMapping}")
    val after = spark.sql(
      "SELECT SUM(fee) AS f, SUM(price) AS p FROM graft.db.rn").head()
    assert(after.getDouble(0) == 61.0, "fee still decodes its bytes")
    assert(after.isNullAt(1), "re-added price reads null, never fee's bytes")
    // partition columns cannot be renamed (historical commits key them)
    spark.sql("""CREATE TABLE graft.db.rnp (id INT, day STRING)
                 PARTITIONED BY (day)""")
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.rnp RENAME COLUMN day TO dt")
    }
  }

  test("nested ADD COLUMNS and CHANGE COLUMN comment") {
    spark.sql("CREATE TABLE graft.db.nst (id INT, s STRUCT<a: INT>)")
    spark.sql("INSERT INTO graft.db.nst VALUES (1, named_struct('a', 7))")
    spark.sql("ALTER TABLE graft.db.nst ADD COLUMNS (s.b STRING)")
    // old rows decode the new nested field as null
    val r = spark.sql("SELECT s.a, s.b FROM graft.db.nst").head()
    assert(r.getInt(0) == 7 && r.isNullAt(1))
    spark.sql("INSERT INTO graft.db.nst VALUES (2, named_struct('a', 8, 'b', 'x'))")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.nst WHERE s.b = 'x'")
      .head().getLong(0) == 1)
    spark.sql("ALTER TABLE graft.db.nst ALTER COLUMN id COMMENT 'row id'")
    val meta = DeltaLog.forTable(spark, s"$warehouse/db/nst").update().metadata
    assert(meta.schema("id").getComment().contains("row id"))
    assert(meta.schema("s").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("a", "b"))
    val ops = DeltaLog.forTable(spark, s"$warehouse/db/nst").history()
      .map(_.operation.getOrElse(""))
    assert(ops.contains("ADD COLUMNS") && ops.contains("CHANGE COLUMN"))
  }

  test("a failing CTAS leaves NO table (atomic staging)") {
    intercept[Exception] {
      spark.sql("""CREATE TABLE graft.db.ctas_fail AS
                   SELECT CASE WHEN id > 5 THEN raise_error('boom')
                          ELSE CAST(id AS STRING) END AS v
                   FROM range(10)""")
    }
    assert(!DeltaTable.isDeltaTable(spark, s"$warehouse/db/ctas_fail"))
    // no staged residue is left visible as a table either
    assert(!spark.sql("SHOW TABLES IN graft.db").collect()
      .map(_.getString(1)).contains("ctas_fail"))
    // and a successful CTAS after the failure works normally
    spark.sql("CREATE TABLE graft.db.ctas_ok AS SELECT id FROM range(5)")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.ctas_ok").head().getLong(0) == 5)
  }

  test("a failing REPLACE TABLE AS SELECT keeps the ORIGINAL table") {
    spark.sql("CREATE TABLE graft.db.rpl AS SELECT id FROM range(3)")
    intercept[Exception] {
      spark.sql("""REPLACE TABLE graft.db.rpl AS
                   SELECT raise_error('nope') AS v FROM range(1)""")
    }
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.rpl").head().getLong(0) == 3)
    spark.sql("REPLACE TABLE graft.db.rpl AS SELECT id, id * 3 AS t FROM range(4)")
    assert(spark.sql("SELECT SUM(t) FROM graft.db.rpl").head().getLong(0) == 18)
  }

  test("DROP TABLE evicts only the dropped table's cached log") {
    spark.sql("CREATE TABLE graft.db3.keepme (v INT)")
    spark.sql("CREATE TABLE graft.db3.dropme (v INT)")
    spark.sql("INSERT INTO graft.db3.keepme VALUES (1)")
    val keptLog = DeltaLog.forTable(spark, s"$warehouse/db3/keepme")
    val keptSnapshot = keptLog.update()
    spark.sql("DROP TABLE graft.db3.dropme")
    // same cached DeltaLog instance, same cached snapshot — not re-replayed
    assert(DeltaLog.forTable(spark, s"$warehouse/db3/keepme") eq keptLog)
    assert(keptLog.snapshot eq keptSnapshot)
  }

  test("DESCRIBE shows log-derived schema; unsupported ALTER rejected") {
    spark.sql("CREATE TABLE graft.db.desc_t (a INT, b STRING)")
    val cols = spark.sql("DESCRIBE TABLE graft.db.desc_t").collect()
      .map(_.getString(0)).filter(c => c == "a" || c == "b")
    assert(cols.toSet == Set("a", "b"))
    intercept[Exception] { // type changes rewrite data; still unsupported
      spark.sql("ALTER TABLE graft.db.desc_t ALTER COLUMN a TYPE BIGINT")
    }
  }

  test("SQL DELETE FROM: metadata-only on partition predicates, rewrite on data") {
    spark.sql("""CREATE TABLE graft.db.del (id INT, grp STRING)
                 PARTITIONED BY (grp)""")
    spark.sql("""INSERT INTO graft.db.del
                 SELECT CAST(id AS INT), concat('g', CAST(id % 3 AS STRING))
                 FROM range(0, 30)""")
    val path = s"$warehouse/db/del"
    // partition-only predicate: files drop, nothing rewrites
    spark.sql("DELETE FROM graft.db.del WHERE grp = 'g0'")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.del").head().getLong(0) == 20)
    val ops1 = DeltaLog.forTable(spark, path).history().head
    assert(ops1.operation.contains("DELETE"))
    assert(!ops1.operationMetrics.exists(_.contains("numAddedFiles")),
      s"partition delete must not rewrite: ${ops1.operationMetrics}")
    // data predicate: only matching files rewrite
    spark.sql("DELETE FROM graft.db.del WHERE id >= 20 AND grp = 'g1'")
    // g1 holds ids 1,4,...,28; three of them (22,25,28) are >= 20
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.del").head().getLong(0) == 17)
    assert(spark.sql("SELECT MAX(id) FROM graft.db.del WHERE grp = 'g1'")
      .head().getInt(0) == 19)
    // TRUNCATE drops everything, metadata-only
    spark.sql("TRUNCATE TABLE graft.db.del")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.del").head().getLong(0) == 0)
  }

  test("SQL UPDATE applies SET to matching rows transactionally") {
    spark.sql("CREATE TABLE graft.db.upd (id INT, amount DOUBLE, tag STRING)")
    spark.sql("""INSERT INTO graft.db.upd
                 SELECT CAST(id AS INT), id * 1.0, 'keep' FROM range(0, 10)""")
    spark.sql("UPDATE graft.db.upd SET amount = amount * 2, tag = 'bumped' " +
      "WHERE id >= 7")
    val rows = spark.sql(
      "SELECT id, amount, tag FROM graft.db.upd ORDER BY id").collect()
    assert(rows.map(_.getDouble(1)).toSeq ==
      (0 until 7).map(_.toDouble) ++ Seq(14.0, 16.0, 18.0))
    assert(rows.count(_.getString(2) == "bumped") == 3)
    // the commit is a logged UPDATE, visible in history
    assert(DeltaLog.forTable(spark, s"$warehouse/db/upd").history()
      .head.operation.contains("UPDATE"))
    // unconditional UPDATE touches every row
    spark.sql("UPDATE graft.db.upd SET tag = 'all'")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.upd WHERE tag = 'all'")
      .head().getLong(0) == 10)
  }

  test("SQL MERGE INTO routes to the transactional merge") {
    spark.sql("CREATE TABLE graft.db.mrg (id INT, price DOUBLE)")
    spark.sql("INSERT INTO graft.db.mrg VALUES (1, 10.0), (2, 20.0), (3, 30.0)")
    spark.sql("CREATE TABLE graft.db.mrg_src (id INT, price DOUBLE)")
    spark.sql("INSERT INTO graft.db.mrg_src VALUES (2, 99.0), (4, 40.0)")
    spark.sql("""MERGE INTO graft.db.mrg AS tgt
                 USING graft.db.mrg_src AS src ON tgt.id = src.id
                 WHEN MATCHED THEN UPDATE SET price = src.price
                 WHEN NOT MATCHED THEN INSERT *""")
    val rows = spark.sql("SELECT id, price FROM graft.db.mrg ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1, 10.0), (2, 99.0), (3, 30.0), (4, 40.0)))
    assert(DeltaLog.forTable(spark, s"$warehouse/db/mrg").history()
      .head.operation.contains("MERGE"))
    // WHEN MATCHED DELETE
    spark.sql("""MERGE INTO graft.db.mrg AS tgt
                 USING graft.db.mrg_src AS src ON tgt.id = src.id
                 WHEN MATCHED THEN DELETE""")
    assert(spark.sql("SELECT id FROM graft.db.mrg ORDER BY id").collect()
      .map(_.getInt(0)).toSeq == Seq(1, 3))
  }

  test("SQL MERGE INTO supports the full ordered-clause surface") {
    spark.sql("CREATE TABLE graft.db.mrgc (id INT, price DOUBLE)")
    spark.sql(
      "INSERT INTO graft.db.mrgc VALUES (1, 10.0), (2, 20.0), (3, 30.0), (9, 90.0)")
    spark.sql("CREATE TABLE graft.db.mrgc_src (id INT, price DOUBLE)")
    spark.sql(
      "INSERT INTO graft.db.mrgc_src VALUES (1, 100.0), (2, 5.0), (3, 300.0), (4, 40.0), (5, 1.0)")
    spark.sql("""MERGE INTO graft.db.mrgc AS tgt
                 USING graft.db.mrgc_src AS src ON tgt.id = src.id
                 WHEN MATCHED AND src.price < 10 THEN DELETE
                 WHEN MATCHED AND src.price > 150 THEN UPDATE SET price = src.price
                 WHEN NOT MATCHED AND src.price > 20 THEN INSERT (id, price) VALUES (src.id, src.price)
                 WHEN NOT MATCHED BY SOURCE AND tgt.price > 50 THEN DELETE""")
    val rows = spark.sql("SELECT id, price FROM graft.db.mrgc ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    // 1: matched, neither condition fires (100 in [10,150]) → carries
    // 2: matched, src.price 5 < 10 → deleted
    // 3: matched, src.price 300 > 150 → updated
    // 4: unmatched, price 40 > 20 → inserted; 5: unmatched, 1 <= 20 → dropped
    // 9: not matched by source, tgt.price 90 > 50 → deleted
    assert(rows == Seq((1, 10.0), (3, 300.0), (4, 40.0)), rows.toString)
  }

  test("RENAME COLUMN upgrades to protocol-conformant column mapping") {
    spark.sql("CREATE TABLE graft.db.cmup (id INT, v STRING)")
    spark.sql("INSERT INTO graft.db.cmup VALUES (1, 'x')")
    spark.sql("ALTER TABLE graft.db.cmup RENAME COLUMN v TO val")
    val path = s"$warehouse/db/cmup"
    val snap = DeltaLog.forTable(spark, path).update()
    // the table is now a REAL Delta column-mapped table: name mode,
    // reader 2 / writer 5, every field carrying delta.columnMapping.id
    // and physicalName — a foreign Delta reader decodes it
    assert(snap.metadata.configuration
      .get("delta.columnMapping.mode").contains("name"))
    assert(snap.protocol.minReaderVersion == 2 &&
      snap.protocol.minWriterVersion == 5, snap.protocol.toString)
    snap.metadata.schema.fields.foreach { f =>
      assert(f.metadata.contains("delta.columnMapping.id"), f.name)
      assert(f.metadata.contains("delta.columnMapping.physicalName"), f.name)
    }
    // the renamed column keeps its ORIGINAL physical name
    assert(snap.metadata.schema("val").metadata
      .getString("delta.columnMapping.physicalName") == "v")
    // our own engine still reads AND writes it (writer 5 gate)
    spark.sql("INSERT INTO graft.db.cmup VALUES (2, 'y')")
    val rows = spark.sql("SELECT id, val FROM graft.db.cmup ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((1, "x"), (2, "y")))
    // ids stay stable across further alters
    spark.sql("ALTER TABLE graft.db.cmup RENAME COLUMN val TO value")
    val snap2 = DeltaLog.forTable(spark, path).update()
    assert(snap2.metadata.schema("value").metadata
      .getLong("delta.columnMapping.id") ==
      snap.metadata.schema("val").metadata.getLong("delta.columnMapping.id"))
    assert(snap2.metadata.schema("value").metadata
      .getString("delta.columnMapping.physicalName") == "v")
  }

  test("DROP COLUMN is metadata-only and a re-added name reads as null") {
    spark.sql("CREATE TABLE graft.db.dc (id INT, secret STRING, keep DOUBLE)")
    spark.sql("INSERT INTO graft.db.dc VALUES (1, 'clas', 1.5), (2, 'sified', 2.5)")
    spark.sql("ALTER TABLE graft.db.dc DROP COLUMN secret")
    val path = s"$warehouse/db/dc"
    val meta = DeltaLog.forTable(spark, path).update().metadata
    assert(meta.schema.fieldNames.toSeq == Seq("id", "keep"))
    assert(DeltaLog.forTable(spark, path).history()
      .map(_.operation.getOrElse("")).contains("DROP COLUMNS"))
    // surviving columns still read from the old files
    assert(spark.sql("SELECT SUM(keep) FROM graft.db.dc").head().getDouble(0) == 4.0)
    // re-adding the SAME name must NOT resurrect the dropped bytes: the
    // new column gets a fresh physical name and old rows decode as null
    spark.sql("ALTER TABLE graft.db.dc ADD COLUMNS (secret STRING)")
    val rows = spark.sql("SELECT id, secret FROM graft.db.dc ORDER BY id").collect()
    assert(rows.forall(_.isNullAt(1)),
      s"dropped bytes resurfaced: ${rows.mkString(",")}")
    // re-added column sits at the END of the schema now: (id, keep, secret)
    spark.sql("INSERT INTO graft.db.dc VALUES (3, 3.5, 'fresh')")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.dc WHERE secret = 'fresh'")
      .head().getLong(0) == 1)
    // dropping a renamed column quarantines its ORIGINAL physical name
    spark.sql("ALTER TABLE graft.db.dc RENAME COLUMN keep TO kept")
    spark.sql("ALTER TABLE graft.db.dc DROP COLUMN kept")
    val m2 = DeltaLog.forTable(spark, path).update().metadata
    assert(m2.configuration(graft.sql.GraftCatalog.DroppedPhysicalKey)
      .split(",").toSet == Set("secret", "keep"))
    spark.sql("ALTER TABLE graft.db.dc ADD COLUMNS (keep DOUBLE)")
    assert(spark.sql("SELECT keep FROM graft.db.dc WHERE id = 1").head().isNullAt(0))
  }

  test("SQL OPTIMIZE compacts small files; ZORDER BY re-clusters") {
    spark.sql("CREATE TABLE graft.db.opt (id BIGINT, k BIGINT)")
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO graft.db.opt SELECT id, id * 7 FROM " +
        s"range(${i * 100}, ${i * 100 + 100})")
    }
    val path = s"$warehouse/db/opt"
    val before = DeltaLog.forTable(spark, path).update().numOfFiles
    assert(before >= 4)
    val res = spark.sql("OPTIMIZE graft.db.opt").collect()
    assert(res.head.getString(0) == path)
    graft.delta.DeltaLog.clearCache()
    val after = DeltaLog.forTable(spark, path).update()
    assert(after.numOfFiles < before)
    assert(spark.sql("SELECT COUNT(*), SUM(k) FROM graft.db.opt").head()
      .getLong(0) == 400)
    // ZORDER form parses and rewrites; history records OPTIMIZE
    spark.sql("OPTIMIZE graft.db.opt ZORDER BY (id, k)")
    val ops = DeltaTable.forPath(spark, path).history()
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops.count(_ == "OPTIMIZE") >= 2, s"history: $ops")
  }

  test("ALTER TABLE CLUSTER BY on a NAMED table routes through Spark's " +
      "native grammar to the catalog (r11 deferred finding)") {
    // the graft parser intercepts CLUSTER BY only for path literals; a
    // catalog identifier takes Spark's own AlterTableClusterBy plan ->
    // TableChange.ClusterBy -> GraftCatalog.alterTable, so a second
    // registered catalog would keep its own clustering DDL
    spark.sql("CREATE TABLE graft.db.cb (id INT, k INT, v STRING)")
    spark.sql("ALTER TABLE graft.db.cb CLUSTER BY (id, k)")
    val path = s"$warehouse/db/cb"
    assert(DeltaTable.forPath(spark, path).clusteringColumns == Seq("id", "k"))
    spark.sql("ALTER TABLE graft.db.cb CLUSTER BY NONE")
    assert(DeltaTable.forPath(spark, path).clusteringColumns.isEmpty)
    // unknown column refused by the same validation as the API path
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.cb CLUSTER BY (nope)")
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
  }

  test("RENAME losing a destination race restores the source instead of " +
      "nesting it inside the winner") {
    // simulate the window: the destination directory appears AFTER the
    // tableExists check (here: a bare dir that the existence check —
    // keyed on _delta_log — does not count as a table). Hadoop rename
    // onto an existing directory nests the source inside it and reports
    // success; the catalog must detect the nesting, move the source
    // back, and concede.
    spark.sql("CREATE TABLE graft.db.rn_src (v INT)")
    spark.sql("INSERT INTO graft.db.rn_src VALUES (7)")
    val fs = new org.apache.hadoop.fs.Path(warehouse)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // non-empty (a winner mid-CREATE has data before its _delta_log
    // lands): a POSIX rename onto it fails ENOTEMPTY and Hadoop's
    // rename-into semantics nest the source instead
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$warehouse/db/rn_dst/batch-x"))
    fs.create(new org.apache.hadoop.fs.Path(
      s"$warehouse/db/rn_dst/batch-x/part-0.parquet"), true).close()
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.rn_src RENAME TO db.rn_dst")
    }
    assert(e.getMessage.toLowerCase.contains("already exists"), e.getMessage)
    // the source survived the lost race, data intact
    assert(spark.sql("SELECT v FROM graft.db.rn_src").collect()
      .map(_.getInt(0)).toSeq == Seq(7))
    // and it was NOT left nested inside the destination
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$warehouse/db/rn_dst/rn_src")))
  }

  test("SQL VACUUM on a quoted path returns the deletable count") {
    val dir = Files.createTempDirectory("graft-vacuum-sql-").toString
    import spark.implicits._
    DeltaTable.write((1 to 10).toDF("id"), dir)
    // no expired tombstones yet → nothing deleted, statement still runs
    val res = spark.sql(s"VACUUM '$dir' RETAIN 168 HOURS").collect()
    assert(res.head.getString(0) == dir)
    assert(res.head.getLong(1) == 0L)
    // non-graft targets are rejected loudly
    intercept[Exception] { spark.sql("VACUUM not_a_table").collect() }
  }

  test("RENAME keeps a legitimately nested delta directory named like the " +
      "source (identity check, not name-shape, decides the race rollback)") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft.db.rn_outer (id INT)")
    spark.sql("INSERT INTO graft.db.rn_outer VALUES (1), (2)")
    // a user-managed delta directory INSIDE the table, named like the
    // table's own leaf: after a successful rename it sits at
    // dest/<srcName>/_delta_log — exactly the lost-race nesting shape
    DeltaTable.write(Seq(9).toDF("x"), s"$warehouse/db/rn_outer/rn_outer")
    spark.sql("ALTER TABLE graft.db.rn_outer RENAME TO db.rn_moved")
    // the rename held: destination serves the outer table...
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.rn_moved")
      .head().getLong(0) == 2L)
    // ...the nested directory moved WITH it, untouched...
    assert(DeltaTable.isDeltaTable(spark, s"$warehouse/db/rn_moved/rn_outer"))
    assert(DeltaLog.forTable(spark, s"$warehouse/db/rn_moved/rn_outer")
      .update().version == 0L)
    // ...and nothing was moved back to the source path
    assert(!new java.io.File(s"$warehouse/db/rn_outer").exists())
  }

  test("RENAME fails loudly when the nested directory's identity cannot be " +
      "read — ambiguity must not resolve to silent success (ADVICE r13)") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft.db.rn_amb (id INT)")
    spark.sql("INSERT INTO graft.db.rn_amb VALUES (1), (2)")
    // a nested delta-SHAPED directory named like the table's own leaf,
    // whose log is garbage: after the rename it sits at
    // dest/<srcName>/_delta_log — the lost-race nesting shape — but its
    // metadata id is unreadable. Guessing "own content" would let a REAL
    // lost race return success with the source silently nested inside the
    // winner; guessing "lost race" would unwind a legitimate rename. The
    // catalog must surface the ambiguity to the operator instead.
    val nestedLog = new java.io.File(
      s"$warehouse/db/rn_amb/rn_amb/_delta_log")
    assert(nestedLog.mkdirs())
    java.nio.file.Files.write(
      nestedLog.toPath.resolve("00000000000000000000.json"),
      "not json at all".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      spark.sql("ALTER TABLE graft.db.rn_amb RENAME TO db.rn_amb2")
    }
    assert(e.getMessage.contains("identity could not be read"), e.getMessage)
    assert(e.getMessage.contains("rn_amb"), e.getMessage)
  }
}
