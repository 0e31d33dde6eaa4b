package graft.sources

import java.sql.DriverManager

import graft.SparkSpec
import graft.delta.DeltaTable

/** S6 against an embedded Derby database (the JDBC driver Spark ships). */
class JdbcImportSpec extends SparkSpec {
  import spark.implicits._

  private def withDerby[T](name: String)(f: String => T): T = {
    val url = s"jdbc:derby:memory:$name;create=true"
    try f(url)
    finally {
      try DriverManager.getConnection(s"jdbc:derby:memory:$name;drop=true")
      catch { case _: java.sql.SQLException => /* drop always "fails" */ }
    }
  }

  test("ranged parallel JDBC read lands in a Delta table") {
    withDerby("imp1") { url =>
      val conn = DriverManager.getConnection(url)
      conn.createStatement().execute(
        "CREATE TABLE app.events (id INT NOT NULL, category VARCHAR(10), amount DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO app.events VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"c${i % 3}"); ps.setDouble(3, i * 1.5)
        ps.addBatch()
      }
      ps.executeBatch(); conn.close()

      withTempDir { dest =>
        val version = JdbcImport.run(spark, JdbcImport.ImportConfig(
          url = url, source = "app.events", destination = dest,
          splitBy = "id", chunks = 4))
        assert(version == 0)
        val table = DeltaTable.forPath(spark, dest).toDF
        assert(table.count() == 100)
        assert(table.agg(org.apache.spark.sql.functions.sum($"id"))
          .as[Long].head() == 5050)
        // chunked read produced multiple files committed in one version
        assert(graft.delta.DeltaLog.forTable(spark, dest)
          .update().allFiles.size > 1)
      }
    }
  }

  test("transform chain and partitioned destination") {
    withDerby("imp2") { url =>
      val conn = DriverManager.getConnection(url)
      conn.createStatement().execute(
        "CREATE TABLE app.t (id INT NOT NULL, v VARCHAR(5))")
      val ps = conn.prepareStatement("INSERT INTO app.t VALUES (?, ?)")
      (1 to 20).foreach { i => ps.setInt(1, i); ps.setString(2, s"g${i % 2}"); ps.addBatch() }
      ps.executeBatch(); conn.close()

      withTempDir { dest =>
        // Derby folds unquoted identifiers to upper case
        JdbcImport.run(spark, JdbcImport.ImportConfig(
          url = url, source = "app.t", destination = dest,
          splitBy = "id", chunks = 2, partitionBy = Seq("V")),
          transform = _.filter($"ID" <= 10))
        val log = graft.delta.DeltaLog.forTable(spark, dest)
        assert(log.update().metadata.partitionColumns == Seq("V"))
        assert(DeltaTable.forPath(spark, dest).toDF.count() == 10)
      }
    }
  }
}
