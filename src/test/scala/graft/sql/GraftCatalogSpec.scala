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

  test("DESCRIBE shows log-derived schema; unsupported ALTER rejected") {
    spark.sql("CREATE TABLE graft.db.desc_t (a INT, b STRING)")
    val cols = spark.sql("DESCRIBE TABLE graft.db.desc_t").collect()
      .map(_.getString(0)).filter(c => c == "a" || c == "b")
    assert(cols.toSet == Set("a", "b"))
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.desc_t DROP COLUMN b")
    }
  }
}
