package graft.delta

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property fuzzing of the r14 chunked streaming offsets: a RANDOM
  * commit script (pure-add / cdc-carrying / delete-only versions) driven
  * through [[streaming.DeltaSource]] under RANDOM per-trigger budgets
  * with RANDOM mid-drain restarts must deliver exactly the brute-force
  * oracle's file sequence — every file exactly once, every batch within
  * its trigger's budget, batches contiguous in the walk order, and
  * offsets resuming through their JSON round-trip (the engine's
  * offset-log path) wherever the restart lands: mid-version on an add,
  * cdc, or remove index, mid-snapshot on a path rank, or at a boundary.
  *
  * Two drains per case over the same table:
  *  - CDF walk from version 1 (per-version expectation: pure-add -> its
  *    adds, cdc-carrying -> its cdc files only, delete-only -> its
  *    removes);
  *  - non-CDF initial-snapshot drain (no startingVersion): the active
  *    set at head in sort-by-path order.
  * The oracle re-derives both from the generated script alone — none of
  * the source's machinery. Ghost files are log-only, so the proof is
  * plan-level (any accidental data access fails loudly).
  */
class StreamChunkingFuzzSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------- case model
  sealed trait CommitShape
  case class PureAdd(n: Int) extends CommitShape
  case class CdcVersion(nCdc: Int, nAdds: Int, nRemoves: Int)
    extends CommitShape
  case class DeleteOnly(n: Int) extends CommitShape

  /** A trigger's admission limit: a file cap or a byte cap (the byte
    * path crosses the memo's size accounting and the snapshot cursor's
    * cumulative-bytes cut — the subtlest arithmetic in the chunker). */
  sealed trait Budget
  case class FileBudget(n: Int) extends Budget
  case class ByteBudget(b: Long) extends Budget
  case class CompositeBudget(n: Int, b: Long) extends Budget

  case class FuzzCase(shapes: List[CommitShape], budgets: List[Budget],
                      restarts: List[Boolean])

  private val genShape: Gen[CommitShape] = Gen.frequency(
    4 -> Gen.choose(1, 12).map(PureAdd.apply),
    3 -> (for {
      c <- Gen.choose(1, 10)
      a <- Gen.choose(0, 4)
      r <- Gen.choose(0, 3)
    } yield CdcVersion(c, a, r)),
    2 -> Gen.choose(1, 8).map(DeleteOnly.apply))

  private val genBudget: Gen[Budget] = Gen.frequency(
    3 -> Gen.choose(1, 15).map(FileBudget.apply),
    // ghost sizes run 50-60 (cdc/removes) to ~100-900 (adds), so this
    // range spans "one file barely fits" to "a dozen fit"
    2 -> Gen.choose(60L, 2500L).map(ByteBudget.apply),
    // both caps at once (the engine's CompositeReadLimit): the batch
    // ends at whichever budget runs out first
    1 -> (for {
      n <- Gen.choose(1, 15)
      b <- Gen.choose(60L, 2500L)
    } yield CompositeBudget(n, b)))

  private val genCase: Gen[FuzzCase] = for {
    n <- Gen.choose(1, 5)
    shapes <- Gen.listOfN(n, genShape)
    budgets <- Gen.listOfN(400, genBudget)
    restarts <- Gen.listOfN(400,
      Gen.frequency(7 -> Gen.const(false), 3 -> Gen.const(true)))
  } yield FuzzCase(shapes, budgets, restarts)

  /** One commit's materialized actions plus its CDF expectation as
    * (file name, budget-relevant size) in walk order. The builder is the
    * shared source of truth: the table construction AND the oracle both
    * read from it (clamps applied identically). */
  private case class BuiltCommit(actions: Seq[Action],
                                 cdfFiles: Seq[(String, Long)])

  /** Walk the script deterministically: returns (commits, finalActive).
    * DeleteOnly/CdcVersion removes clamp to the currently active ghosts
    * (earliest-added first); a DeleteOnly with nothing to remove
    * degrades to a 1-file PureAdd so every commit stays non-empty. */
  private def build(shapes: List[CommitShape])
      : (Seq[BuiltCommit], Seq[(String, Long)]) = {
    val active =
      scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var serial = 0
    def ghostAdds(c: Int, n: Int): Seq[AddFile] = (1 to n).map { i =>
      serial += 1
      val name = f"g$c%02d-$serial%04d.parquet"
      active += ((name, 100L + serial))
      AddFile(name, Map.empty, 100L + serial, 1L, dataChange = true)
    }
    def takeRemoves(n: Int): Seq[RemoveFile] = {
      val victims = active.take(n).toSeq
      active --= victims
      victims.map { case (p, _) => RemoveFile(p, Some(1L),
        dataChange = true,
        partitionValues = Some(Map.empty), size = Some(50L)) }
    }
    val commits = shapes.zipWithIndex.map { case (shape, ci) =>
      shape match {
        case PureAdd(n) =>
          val adds = ghostAdds(ci, n)
          BuiltCommit(adds, adds.map(a => a.path -> a.size))
        case DeleteOnly(n0) =>
          val n = math.min(n0, active.size)
          if (n == 0) {
            val adds = ghostAdds(ci, 1)
            BuiltCommit(adds, adds.map(a => a.path -> a.size))
          } else {
            val rms = takeRemoves(n)
            BuiltCommit(rms, rms.map(r => r.path -> 50L))
          }
        case CdcVersion(nCdc, nAdds, nRemoves0) =>
          val rms = takeRemoves(math.min(nRemoves0, active.size))
          val adds = ghostAdds(ci, nAdds)
          val cdcs = (1 to nCdc).map { i =>
            serial += 1
            AddCDCFile(f"c$ci%02d-$serial%04d.parquet", Map.empty, 60L)
          }
          // line order within the commit file: cdc, adds, removes —
          // fixed so the oracle's within-version order is well-defined
          BuiltCommit(cdcs ++ adds ++ rms, cdcs.map(c => c.path -> 60L))
      }
    }
    (commits, active.toSeq)
  }

  private def plannedPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.logical.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Nil
        }
    }.flatten.map(p => new org.apache.hadoop.fs.Path(p).getName)

  /** Drive the source to exhaustion under the case's budget/restart
    * scripts; assert per-batch budget (files, or bytes via `sizeOf` —
    * a single file may exceed a byte cap, the admit-at-least-one rule) +
    * contiguity against `expected` (the walk-order file sequence) as it
    * goes; return batches taken. */
  private def drain(log: DeltaLog, options: Map[String, String],
                    c: FuzzCase, expected: Seq[(String, Long)]): Int = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    var src = new streaming.DeltaSource(spark.sqlContext, log, options)
    var prev: org.apache.spark.sql.connector.read.streaming.Offset = null
    var remaining = expected
    var batches = 0
    var step = 0
    var done = false
    while (!done) {
      assert(step < 380, s"drain did not converge after $step triggers")
      val budget = c.budgets(step % c.budgets.size)
      val restart = c.restarts(step % c.restarts.size)
      step += 1
      val limit = budget match {
        case FileBudget(n) => ReadLimit.maxFiles(n)
        case ByteBudget(b) => ReadLimit.maxBytes(b)
        case CompositeBudget(n, b) => ReadLimit.compositeLimit(
          Array(ReadLimit.maxFiles(n), ReadLimit.maxBytes(b)))
      }
      val end = src.latestOffset(prev, limit)
      if (end == null || (prev != null && end.json == prev.json)) {
        done = true
      } else {
        val files = plannedPaths(src.getBatch(
          Option(prev).map(_.asInstanceOf[
            org.apache.spark.sql.execution.streaming.Offset]),
          end.asInstanceOf[
            org.apache.spark.sql.execution.streaming.Offset]))
        assert(files.nonEmpty, s"empty non-final batch at ${end.json}")
        // contiguity: the batch is exactly the next slice of the walk
        // (sizes come from the oracle slice — occurrence-specific, since
        // a ghost added in one version can reappear as a remove later)
        val slice = remaining.take(files.size)
        assert(files.toSet == slice.map(_._1).toSet,
          s"batch diverged at ${end.json}: got ${files.sorted} " +
            s"expected slice ${slice.map(_._1).sorted}")
        budget match {
          case FileBudget(n) =>
            assert(files.size <= n,
              s"batch of ${files.size} files over file budget $n " +
                s"(offset ${end.json})")
          case ByteBudget(b) =>
            val sz = slice.map(_._2).sum
            assert(files.size == 1 || sz <= b,
              s"batch of ${files.size} files / $sz bytes over byte " +
                s"budget $b (offset ${end.json})")
          case CompositeBudget(n, b) =>
            val sz = slice.map(_._2).sum
            assert(files.size <= n,
              s"composite batch of ${files.size} files over $n " +
                s"(offset ${end.json})")
            assert(files.size == 1 || sz <= b,
              s"composite batch of $sz bytes over $b (offset ${end.json})")
        }
        remaining = remaining.drop(files.size)
        batches += 1
        prev = end
        if (restart) {
          // the engine's offset-log path: a fresh source (empty memo,
          // empty cursor) resumes from the parsed JSON
          src = new streaming.DeltaSource(spark.sqlContext, log, options)
          prev = streaming.DeltaSourceOffset.parse(prev.json)
        }
      }
    }
    assert(remaining.isEmpty,
      s"drain ended with ${remaining.size} undelivered files: " +
        s"${remaining.take(5).map(_._1)}")
    batches
  }

  test("random commit scripts x random budgets x random restarts: the " +
      "chunked CDF walk and the chunked initial-snapshot drain both " +
      "deliver the oracle's exact file sequence") {
    val prop = Prop.forAll(genCase) { c =>
      withTempDir { dir =>
        DeltaTable.write(Seq(1).toDF("v"), dir,
          configuration = Map("delta.checkpointInterval" -> "1000000"))
        val log = DeltaLog.forTable(spark, dir)
        val (commits, finalActive) = build(c.shapes)
        commits.foreach(bc =>
          log.startTransaction().commit(bc.actions,
            DeltaOperations.ManualUpdate))

        // CDF walk from version 1: per-version expectation in order
        val cdfExpected = commits.flatMap(_.cdfFiles)
        drain(log, Map("startingVersion" -> "1",
          "readChangeFeed" -> "true"), c, cdfExpected)

        // initial-snapshot drain: active set at head in path order, plus
        // version 0's real parquet. The cursor sorts by the FULL
        // relative path (the real file lives under a batch-<uuid>/
        // subdir), while plannedPaths compares by file NAME — so sort by
        // full path, then project to names
        val realV0 = log.getSnapshotForVersionAsOf(0).allFiles
          .map(f => (f.path, f.size))
        val snapExpected = (finalActive.map { case (p, sz) =>
            (p, (p, sz)) } ++
            realV0.map { case (p, sz) =>
              (p, (new org.apache.hadoop.fs.Path(p).getName, sz)) })
          .sortBy(_._1).map(_._2)
        DeltaLog.clearCache()
        val log2 = DeltaLog.forTable(spark, dir)
        drain(log2, Map.empty, c, snapExpected)
        true
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(60)
        .withInitialSeed(org.scalacheck.rng.Seed(1414L)),
      prop)
    assert(result.passed, s"scalacheck: ${result.status}")
  }
}
