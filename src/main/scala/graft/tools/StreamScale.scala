package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{SessionEvent, Sessionize, StepEvent, StreamingFunnel}

/** Scale evidence for the stateful streaming operators: drive Sessionize
  * and StreamingFunnel through MemoryStream micro-batches at two sizes
  * and report wall time, emitted counts (correctness: the expected
  * session/completion totals are known in closed form) and the state
  * store's max row count (boundedness: state must track ACTIVE keys, not
  * stream length).
  *
  * Usage: StreamScale [nEvents ...]  (default tiers 200000 1000000)
  */
object StreamScale {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-stream-scale")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tiers = if (args.nonEmpty) args.map(_.toInt) else Array(200000, 1000000)
    tiers.foreach { n =>
      val s = runSessionize(spark, n)
      println(s"""{"op":"sessionize","events":$n,"sec":${s._1},"sessions":${s._2},"maxStateRows":${s._3}}""")
      val f = runFunnel(spark, n)
      println(s"""{"op":"funnel","events":$n,"sec":${f._1},"completions":${f._2},"maxStateRows":${f._3}}""")
    }
    spark.stop()
  }

  /** B batches of E events; each batch gives each of U users a run of
    * consecutive minutes 120 min after its previous run — exactly ONE
    * session per (user, batch), closed by the next batch's watermark. */
  private def runSessionize(spark: SparkSession, n: Int): (Double, Long, Long) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batches = 10
    val perBatch = n / batches
    val users = math.max(1, perBatch / 20)
    val input = MemoryStream[(Long, Long)]
    val sessions = Sessionize.sessions(
      input.toDS().select($"_1".as("user_id"),
        timestamp_millis(($"_2" + 1440L) * 60000L).as("ts")).as[SessionEvent],
      gapUs = 1800L * 1000000L, watermarkDelay = "10 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("ss_scale").outputMode("append").start()
    var maxState = 0L
    val t0 = System.nanoTime()
    try {
      for (b <- 0 until batches) {
        val base = b.toLong * 120L
        input.addData((0 until perBatch).map(i =>
          ((i % users).toLong, base + (i / users).toLong)): _*)
        q.processAllAvailable()
        maxState = math.max(maxState, stateRows(q))
      }
      input.addData((999999999L, 10000000L)); q.processAllAvailable()
      input.addData((999999999L, 20000000L)); q.processAllAvailable()
      maxState = math.max(maxState, stateRows(q))
      val sec = (System.nanoTime() - t0) / 1e9
      val emitted = spark.table("ss_scale")
        .filter($"user_id" =!= 999999999L).count()
      require(emitted == users.toLong * batches,
        s"expected ${users * batches} sessions, got $emitted")
      (math.rint(sec * 100) / 100, emitted, maxState)
    } finally {
      q.stop(); spark.sql("DROP VIEW IF EXISTS ss_scale")
    }
  }

  /** Each batch introduces FRESH users that complete view→click→purchase
    * within the batch — state must drop converted keys, so maxStateRows
    * stays O(users-per-batch), not O(total users). */
  private def runFunnel(spark: SparkSession, n: Int): (Double, Long, Long) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batches = 10
    val perBatch = n / batches
    val usersPerBatch = math.max(1, perBatch / 3)
    val steps = Seq("view", "click", "purchase")
    val input = MemoryStream[(Long, Long, String)]
    val out = StreamingFunnel.completions(
      input.toDS().select($"_1".as("user_id"),
        timestamp_millis(($"_2" + 1440L) * 60000L).as("ts"),
        $"_3".as("event_type")).as[StepEvent],
      steps, "10 minutes")
    val q = out.writeStream.format("memory")
      .queryName("sf_scale").outputMode("append").start()
    var maxState = 0L
    val t0 = System.nanoTime()
    try {
      for (b <- 0 until batches) {
        val base = b.toLong * 120L
        input.addData((0 until usersPerBatch).flatMap { i =>
          val u = b.toLong * usersPerBatch + i
          steps.zipWithIndex.map { case (st, k) => (u, base + k, st) }
        }: _*)
        q.processAllAvailable()
        maxState = math.max(maxState, stateRows(q))
      }
      input.addData((-1L, 10000000L, "view")); q.processAllAvailable()
      input.addData((-1L, 20000000L, "view")); q.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      val emitted = spark.table("sf_scale").filter($"user_id" >= 0L).count()
      require(emitted == usersPerBatch.toLong * batches,
        s"expected ${usersPerBatch.toLong * batches} completions, got $emitted")
      (math.rint(sec * 100) / 100, emitted, maxState)
    } finally {
      q.stop(); spark.sql("DROP VIEW IF EXISTS sf_scale")
    }
  }

  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
}
