package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Per-query profiler for the optimization rounds: runs named queries in
  * one JVM under EXACTLY the Bench session config, times each sample,
  * records per-job wall clock + descriptions through a listener, and can
  * dump `.explain("formatted")` for the returned frame.
  *
  * Usage:
  *   ProfileQuery <sfDir> <cpus> <outDir> <query1,query2,...> [samples]
  *
  * Writes <outDir>/<query>_plan.txt and prints one line per sample plus a
  * per-job breakdown of the LAST sample.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1)
    val outDir = java.nio.file.Paths.get(args(2))
    java.nio.file.Files.createDirectories(outDir)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val samples = if (args.length > 4) args(4).toInt else 3

    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-job wall clock with descriptions
    case class JobRec(id: Int, desc: String, start: Long, var end: Long)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(e.jobId, JobRec(e.jobId, d, e.time, -1L))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      }
    })

    try SparkEntryWarm.warm(spark) catch { case _: Throwable => }
    try graft.queries.IndexCache.warm(spark, sfDir)
    catch { case t: Throwable => System.err.println(s"warm failed: $t") }

    def clearCaches(): Unit =
      try {
        graft.delta.DeltaLog.clearCache()
        spark.catalog.clearCache()
        graft.queries.ScratchDirs.sweep() // same hygiene as Bench
      } catch { case _: Throwable => }

    // poor-man's driver profiler: sample the query thread's stack every
    // 10 ms and aggregate leaf-ish frames, so the BETWEEN-jobs driver time
    // (planning, footer stats, commit fsync, log replay) becomes visible
    val mainThread = Thread.currentThread()
    val sampling = new java.util.concurrent.atomic.AtomicBoolean(false)
    val frameCounts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val sampler = new Thread(() => {
      while (true) {
        if (sampling.get()) {
          val st = mainThread.getStackTrace
          if (st.nonEmpty) {
            // first frame inside our code or spark (skip pure JDK noise at top)
            val pick = st.find { f =>
              val c = f.getClassName
              c.startsWith("graft.") || c.startsWith("org.apache.spark.") ||
                c.startsWith("org.apache.parquet.") || c.startsWith("org.apache.hadoop.")
            }.getOrElse(st.head)
            // attribute hadoop/util frames to the first graft caller below
            val caller = st.find(f => f.getClassName.startsWith("graft."))
              .map(f => s" <- ${f.getClassName.stripPrefix("graft.")}.${f.getMethodName}")
              .getOrElse {
                st.find(f => f.getClassName.startsWith("org.apache.spark.sql.execution"))
                  .map(f => s" <- ${f.getClassName.stripPrefix("org.apache.spark.sql.")}.${f.getMethodName}")
                  .getOrElse("")
              }
            val key = s"${pick.getClassName}.${pick.getMethodName}$caller"
            frameCounts.merge(key, 1, (a, b) => a + b)
          }
        }
        Thread.sleep(10)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      var lastJobFloor = 0
      (1 to samples).foreach { i =>
        lastJobFloor = jobs.size()
        jobs.clear()
        frameCounts.clear()
        sampling.set(true)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        df.count()
        val tCount = (System.nanoTime() - t1) / 1e9
        val total = (System.nanoTime() - t0) / 1e9
        sampling.set(false)
        println(f"PROFILE $name sample=$i total=$total%.3f build=$tBuild%.3f count=$tCount%.3f")
        if (i == samples) {
          import scala.jdk.CollectionConverters._
          val top = frameCounts.asScala.toSeq.sortBy(-_._2.intValue).take(25)
          top.foreach { case (k, v) => println(f"  FRAME ${v.intValue * 10}%6d ms  $k") }
        }
        PhaseTimers.dumpAndReset().foreach { case (k, sec, n) =>
          println(f"  PHASE $name sample=$i $k%-14s ${sec}%8.3f s  n=$n")
        }
        if (i == samples) {
          // per-job breakdown of this sample, by start time
          import scala.jdk.CollectionConverters._
          val recs = jobs.values().asScala.toSeq.sortBy(_.start)
          val t00 = recs.headOption.map(_.start).getOrElse(0L)
          recs.foreach { r =>
            val dur = if (r.end > 0) (r.end - r.start) / 1e3 else -1.0
            println(f"  JOB ${r.id}%4d +${(r.start - t00) / 1e3}%8.3fs ${dur}%8.3fs  ${r.desc.take(140)}")
          }
          // plan of the returned frame
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(outDir.resolve(s"${name}_plan.txt"),
            plan.getBytes("UTF-8"))
        }
        clearCaches()
      }
    }
    spark.stop()
  }
}

/** Same warmup entry Bench uses, factored so ProfileQuery can't drift. */
object SparkEntryWarm {
  def warm(spark: SparkSession): Unit = {
    try graft.SparkEntry.entry(spark).count()
    catch { case _: Throwable => }
  }
}
