package graft.delta

import java.nio.file.FileAlreadyExistsException

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.delta.storage.HadoopFileSystemLogStore

class LogStoreSpec extends AnyFunSuite {

  private val conf = new Configuration()
  private val store = new HadoopFileSystemLogStore

  private def withDir[T](f: Path => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("logstore-").toFile
    try f(new Path(dir.getAbsolutePath))
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
      }
      rm(dir)
    }
  }

  test("write then read round-trips lines") {
    withDir { dir =>
      val p = new Path(dir, "00.json")
      store.write(p, Iterator("a", "b", "c"), overwrite = false, conf)
      assert(store.read(p, conf) == Seq("a", "b", "c"))
    }
  }

  test("no-overwrite write fails if destination exists and leaves it intact") {
    withDir { dir =>
      val p = new Path(dir, "00.json")
      store.write(p, Iterator("original"), overwrite = false, conf)
      intercept[Exception] {
        store.write(p, Iterator("clobber"), overwrite = false, conf)
      } match {
        case _: FileAlreadyExistsException =>
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        case e => fail(s"unexpected: $e")
      }
      assert(store.read(p, conf) == Seq("original"))
      // no temp litter left behind
      val fs = p.getFileSystem(conf)
      assert(fs.listStatus(dir).map(_.getPath.getName).toSet == Set("00.json"))
    }
  }

  test("listFrom lists names >= start, sorted") {
    withDir { dir =>
      for (n <- Seq("01.json", "03.json", "02.json")) {
        store.write(new Path(dir, n), Iterator("x"), overwrite = false, conf)
      }
      val names = store.listFrom(new Path(dir, "02.json"), conf)
        .map(_.getPath.getName).toSeq
      assert(names == Seq("02.json", "03.json"))
    }
  }

  test("overwrite mode replaces contents (used only for _last_checkpoint)") {
    withDir { dir =>
      val p = new Path(dir, "_last_checkpoint")
      store.write(p, Iterator("v1"), overwrite = true, conf)
      store.write(p, Iterator("v2"), overwrite = true, conf)
      assert(store.read(p, conf) == Seq("v2"))
    }
  }

  test("racing no-overwrite writes: exactly one winner, content intact") {
    // POSIX rename(2) silently REPLACES an existing destination, so a
    // rename-published commit could be clobbered by a concurrent writer
    // that also passed the exists() pre-check (CrossProcessCommitSpec
    // observed a lost commit: 24 racing commits, version 23). The local
    // publish is now link(2) — atomic EEXIST — which this race pins:
    // barrier-aligned writers to the SAME destination, exactly one
    // winner per round, and the destination holds the WINNER's payload.
    withDir { dir =>
      val writers = 8
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
      try {
        (0 until 50).foreach { round =>
          val p = new Path(dir, f"race-$round%03d.json")
          val barrier = new java.util.concurrent.CyclicBarrier(writers)
          val results = (0 until writers).map { w =>
            pool.submit(new java.util.concurrent.Callable[Option[Int]] {
              override def call(): Option[Int] = {
                barrier.await()
                try {
                  store.write(p, Iterator(s"payload-$w"),
                    overwrite = false, conf)
                  Some(w)
                } catch {
                  case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
                    None
                  case _: FileAlreadyExistsException => None
                }
              }
            })
          }
          val winners = results.flatMap(_.get())
          assert(winners.size == 1,
            s"round $round: expected exactly one winner, got $winners")
          assert(store.read(p, conf) == Seq(s"payload-${winners.head}"),
            s"round $round: destination must hold the winner's payload")
        }
      } finally pool.shutdownNow()
    }
  }
}
