package graft.sql

import graft.SparkSpec

/** Statement-shape coverage for the delegating parser: every extension
  * statement parses to its command (with the right fields), and
  * near-miss inputs fall through to Spark's parser untouched. */
class GraftSqlParserSpec extends SparkSpec {

  private def parse(sql: String) = spark.sessionState.sqlParser.parsePlan(sql)

  test("OPTIMIZE forms") {
    assert(parse("OPTIMIZE '/p/t'") ==
      GraftOptimizeCommand(Left("/p/t"), Nil, None))
    assert(parse("optimize '/p/t' zorder by (a, b)") ==
      GraftOptimizeCommand(Left("/p/t"), Seq("a", "b"), None))
    assert(parse("OPTIMIZE '/p/t' WHERE part = 'x'") ==
      GraftOptimizeCommand(Left("/p/t"), Nil, Some("part = 'x'")))
    assert(parse("OPTIMIZE '/p/t' WHERE part = 'x' ZORDER BY (c)") ==
      GraftOptimizeCommand(Left("/p/t"), Seq("c"), Some("part = 'x'")))
  }

  test("OPTIMIZE LOG forms (must not parse as OPTIMIZE of table `LOG`)") {
    assert(parse("OPTIMIZE LOG '/p/t'") ==
      GraftOptimizeLogCommand(Left("/p/t"), None))
    assert(parse("optimize log '/p/t' between 3 and 9") ==
      GraftOptimizeLogCommand(Left("/p/t"), Some((3L, 9L))))
    assert(parse("OPTIMIZE LOG db.t BETWEEN 1 AND 4") ==
      GraftOptimizeLogCommand(Right(Seq("db", "t")), Some((1L, 4L))))
    // a table literally named `log` keeps plain-OPTIMIZE semantics when
    // followed by OPTIMIZE clauses
    assert(parse("OPTIMIZE log ZORDER BY (a)") ==
      GraftOptimizeCommand(Right(Seq("log")), Seq("a"), None))
  }

  test("VACUUM forms") {
    assert(parse("VACUUM '/p/t'") ==
      GraftVacuumCommand(Left("/p/t"), None, false))
    assert(parse("VACUUM '/p/t' RETAIN 168 HOURS") ==
      GraftVacuumCommand(Left("/p/t"), Some(168.0), false))
    assert(parse("VACUUM '/p/t' DRY RUN") ==
      GraftVacuumCommand(Left("/p/t"), None, true))
    assert(parse("VACUUM '/p/t' RETAIN 1.5 HOURS DRY RUN") ==
      GraftVacuumCommand(Left("/p/t"), Some(1.5), true))
  }

  test("RESTORE forms") {
    assert(parse("RESTORE TABLE '/p/t' TO VERSION AS OF 3") ==
      GraftRestoreCommand(Left("/p/t"), 3L))
    assert(parse("RESTORE '/p/t' TO VERSION AS OF 0") ==
      GraftRestoreCommand(Left("/p/t"), 0L))
    assert(parse("RESTORE '/p/t' TO TIMESTAMP AS OF '2026-01-01 00:00:00'") ==
      GraftRestoreTimestampCommand(Left("/p/t"), "2026-01-01 00:00:00"))
  }

  test("CLONE and CONVERT forms") {
    assert(parse("CREATE TABLE '/p/dst' SHALLOW CLONE '/p/src'") ==
      GraftCloneCommand(Left("/p/dst"), Left("/p/src")))
    assert(parse("CONVERT TO DELTA '/p/t'") ==
      GraftConvertCommand(Left("/p/t"), Nil))
    assert(parse("CONVERT TO DELTA '/p/t' PARTITIONED BY (day string, h int)") ==
      GraftConvertCommand(Left("/p/t"), Seq("day", "h")))
  }

  test("constraint forms, including nested parens") {
    assert(parse("ALTER TABLE '/p/t' ADD CONSTRAINT c1 CHECK (v > 0)") ==
      GraftAddConstraintCommand(Left("/p/t"), "c1", "v > 0"))
    assert(parse(
      "ALTER TABLE '/p/t' ADD CONSTRAINT c2 CHECK (v > 0 AND (v < 100 OR w = 1))") ==
      GraftAddConstraintCommand(Left("/p/t"), "c2",
        "v > 0 AND (v < 100 OR w = 1)"))
    assert(parse("ALTER TABLE '/p/t' DROP CONSTRAINT c1") ==
      GraftDropConstraintCommand(Left("/p/t"), "c1", false))
    assert(parse("ALTER TABLE '/p/t' DROP CONSTRAINT IF EXISTS c1") ==
      GraftDropConstraintCommand(Left("/p/t"), "c1", true))
  }

  test("identifier targets parse as multipart identifiers") {
    assert(parse("OPTIMIZE graft.db.t") ==
      GraftOptimizeCommand(Right(Seq("graft", "db", "t")), Nil, None))
    assert(parse("VACUUM `my db`.t DRY RUN") ==
      GraftVacuumCommand(Right(Seq("my db", "t")), None, true))
  }

  test("DROP FEATURE and TBLPROPERTIES forms") {
    assert(parse("ALTER TABLE '/p/t' DROP FEATURE deletionVectors") ==
      GraftDropFeatureCommand(Left("/p/t"), "deletionVectors", false))
    assert(parse("ALTER TABLE '/p/t' DROP FEATURE typeWidening-preview " +
        "TRUNCATE HISTORY") ==
      GraftDropFeatureCommand(Left("/p/t"), "typeWidening-preview", true))
    assert(parse("ALTER TABLE '/p/t' SET TBLPROPERTIES " +
        "('delta.appendOnly'='true', delta.checkpointInterval = 5)") ==
      GraftSetPropertiesCommand(Left("/p/t"), Map(
        "delta.appendOnly" -> "true", "delta.checkpointInterval" -> "5")))
    assert(parse("ALTER TABLE '/p/t' UNSET TBLPROPERTIES " +
        "('delta.appendOnly', delta.enableChangeDataFeed)") ==
      GraftUnsetPropertiesCommand(Left("/p/t"),
        Seq("delta.appendOnly", "delta.enableChangeDataFeed")))
    // '=' inside a quoted value is value text, not a separator
    assert(parse("ALTER TABLE '/p/t' SET TBLPROPERTIES " +
        "('myapp.endpoint'='http://h?x=1&y=2')") ==
      GraftSetPropertiesCommand(Left("/p/t"),
        Map("myapp.endpoint" -> "http://h?x=1&y=2")))
  }

  test("SHOW TBLPROPERTIES: full map, single key, missing key; IO in run()") {
    // parse-only: a nonexistent path must parse cleanly
    assert(parse("SHOW TBLPROPERTIES '/no/such/table'") ==
      GraftShowPropertiesCommand(Left("/no/such/table"), None))
    assert(parse("SHOW TBLPROPERTIES '/p/t' ('delta.appendOnly')") ==
      GraftShowPropertiesCommand(Left("/p/t"), Some("delta.appendOnly")))
    // identifier targets are NOT intercepted (Spark's native handling)
    assert(!parse("SHOW TBLPROPERTIES some_catalog_table")
      .isInstanceOf[GraftShowPropertiesCommand])
    withTempDir { dir =>
      import spark.implicits._
      graft.delta.DeltaTable.write(Seq(1, 2).toDF("v"), dir)
      spark.sql(s"ALTER TABLE '$dir' SET TBLPROPERTIES " +
        "('delta.appendOnly'='false', 'myapp.owner'='graft')")
      val all = spark.sql(s"SHOW TBLPROPERTIES '$dir'").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(all("delta.appendOnly") == "false" &&
        all("myapp.owner") == "graft")
      val one = spark.sql(s"SHOW TBLPROPERTIES '$dir' ('myapp.owner')")
        .collect()
      assert(one.length == 1 && one.head.getString(1) == "graft")
      val missing = spark.sql(s"SHOW TBLPROPERTIES '$dir' ('nope.key')")
        .collect()
      assert(missing.length == 1 &&
        missing.head.getString(1).contains("does not have property"))
    }
  }

  test("DESCRIBE DETAIL defers IO to run(): parsing never touches storage") {
    // a nonexistent path must PARSE cleanly (EXPLAIN / dry parsing must
    // not surface storage errors); only execution reads the log
    val plan = parse("DESCRIBE DETAIL '/no/such/table/anywhere'")
    assert(plan == GraftDescribeDetailCommand(Left("/no/such/table/anywhere")))
    intercept[Exception] {
      spark.sql("DESCRIBE DETAIL '/no/such/table/anywhere'").collect()
    }
  }

  test("near-misses fall through to Spark's parser") {
    // plain CREATE TABLE is NOT intercepted
    assert(!parse("CREATE TABLE t (id INT) USING parquet")
      .isInstanceOf[GraftCloneCommand])
    // ALTER ... ADD COLUMNS is Spark's own statement
    assert(!parse("ALTER TABLE t ADD COLUMNS (x INT)")
      .isInstanceOf[GraftAddConstraintCommand])
    // a SELECT mentioning the keywords is untouched
    assert(!parse("SELECT 'OPTIMIZE t' AS s")
      .isInstanceOf[GraftOptimizeCommand])
  }
}
