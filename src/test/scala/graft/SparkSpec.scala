package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession + temp-dir helpers for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new graft.GraftExtensions)
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def withTempDir[T](f: String => T): T = {
    val dir = Files.createTempDirectory("graft-test-").toFile
    try f(dir.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm))
        x.delete()
      }
      rm(dir)
    }
  }

  override def afterAll(): Unit = {
    graft.delta.DeltaLog.clearCache()
    super.afterAll()
  }
}
