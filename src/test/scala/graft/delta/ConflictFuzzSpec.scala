package graft.delta

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.delta.txn._

/** Property fuzzing of the conflict checker (VERDICT r4 item 5; ref
  * anchor: the reference's OptimisticTransactionSuite.scala:172-336
  * hand-enumerated matrix). The checker's verdict for a random
  * (isolation × read shape × winning-commit action mix × our action mix)
  * must equal a brute-force oracle that re-derives the protocol's
  * conflict rules directly from the case's primitive data — partition
  * values compared as strings, file paths as set intersections — with
  * none of the checker's machinery (no PartitionUtils, no Expressions).
  */
class ConflictFuzzSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- case model
  sealed trait ReadShape
  case object NoRead extends ReadShape
  case object WholeTable extends ReadShape
  case class PartitionEq(v: String) extends ReadShape
  case class PartitionIn(vs: Seq[String]) extends ReadShape
  /** data-column predicate: the engine must be conservative (whole table) */
  case object DataPredicate extends ReadShape

  case class WinAdd(p: String)
  case class Winning(protocol: Boolean, metadata: Boolean, adds: Seq[WinAdd],
                     removes: Seq[String], txnAppIds: Seq[String])
  case class Ours(read: ReadShape, readAppIds: Seq[String],
                  removePartitions: Seq[String], txnAppIds: Seq[String])
  case class Case(isolation: IsolationLevel, ours: Ours, winning: Winning)

  private val pVals = Seq("a", "b", "c", "d", "e")
  private val appIds = Seq("app1", "app2", "app3")

  private val genRead: Gen[ReadShape] = Gen.frequency(
    2 -> Gen.const(NoRead),
    2 -> Gen.const(WholeTable),
    3 -> Gen.oneOf(pVals).map(PartitionEq.apply),
    2 -> Gen.pick(2, pVals).map(vs => PartitionIn(vs.toSeq)),
    1 -> Gen.const(DataPredicate))

  private val genWinning: Gen[Winning] = for {
    proto <- Gen.frequency(9 -> Gen.const(false), 1 -> Gen.const(true))
    meta <- Gen.frequency(9 -> Gen.const(false), 1 -> Gen.const(true))
    nAdds <- Gen.choose(0, 3)
    adds <- Gen.listOfN(nAdds, Gen.oneOf(pVals).map(WinAdd.apply))
    nRem <- Gen.choose(0, 2)
    removes <- Gen.listOfN(nRem, Gen.oneOf(pVals))
    txns <- Gen.someOf(appIds)
  } yield Winning(proto, meta, adds, removes, txns.toSeq)

  private val genOurs: Gen[Ours] = for {
    read <- genRead
    readApps <- Gen.someOf(appIds)
    ourRemoves <- Gen.someOf(pVals)
    ourTxns <- Gen.someOf(appIds)
  } yield Ours(read, readApps.toSeq, ourRemoves.toSeq, ourTxns.toSeq)

  private val genCase: Gen[Case] = for {
    iso <- Gen.oneOf(Serializable, SnapshotIsolation)
    ours <- genOurs
    winning <- genWinning
  } yield Case(iso, ours, winning)

  // ------------------------------------------------- the brute-force oracle
  /** First conflict class in the checker's documented order, or None —
    * derived ONLY from the case data and the known (path -> partition)
    * layout of the fixture table. */
  private def oracle(c: Case, fileOf: Map[String, String]): Option[Class[_]] = {
    val readPaths: Set[String] = c.ours.read match {
      case NoRead => Set.empty
      case WholeTable | DataPredicate => Set.empty // tracked via flag below
      case PartitionEq(v) => fileOf.collect { case (f, p) if p == v => f }.toSet
      case PartitionIn(vs) => fileOf.collect { case (f, p) if vs.contains(p) => f }.toSet
    }
    val wholeTable = c.ours.read == WholeTable || c.ours.read == DataPredicate
    val winRemovePaths = c.winning.removes.flatMap(p =>
      fileOf.collect { case (f, pv) if pv == p => f }).toSet
    val ourRemovePaths = c.ours.removePartitions.flatMap(p =>
      fileOf.collect { case (f, pv) if pv == p => f }).toSet

    if (c.winning.protocol) Some(classOf[ProtocolChangedException])
    else if (c.winning.metadata) Some(classOf[MetadataChangedException])
    else if (c.isolation == Serializable && c.winning.adds.nonEmpty && {
      c.ours.read match {
        case NoRead => false
        case WholeTable | DataPredicate => true
        case PartitionEq(v) => c.winning.adds.exists(_.p == v)
        case PartitionIn(vs) => c.winning.adds.exists(a => vs.contains(a.p))
      }
    }) Some(classOf[ConcurrentAppendException])
    else if (readPaths.intersect(winRemovePaths).nonEmpty ||
             (wholeTable && winRemovePaths.nonEmpty))
      Some(classOf[ConcurrentDeleteReadException])
    else if (ourRemovePaths.intersect(winRemovePaths).nonEmpty)
      Some(classOf[ConcurrentDeleteDeleteException])
    else if ((c.ours.txnAppIds.toSet ++ c.ours.readAppIds)
               .intersect(c.winning.txnAppIds.toSet).nonEmpty)
      Some(classOf[ConcurrentTransactionException])
    else None
  }

  // ------------------------------------------------------ the checker side
  private def verdict(c: Case, log: DeltaLog,
                      fileOf: Map[String, String]): Option[Class[_]] = {
    val txn = log.startTransaction()
    c.ours.read match {
      case NoRead =>
      case WholeTable => txn.readWholeTable()
      case DataPredicate => txn.markFilesAsRead($"x" > 5L)
      case PartitionEq(v) => txn.markFilesAsRead($"p" === v)
      case PartitionIn(vs) => txn.markFilesAsRead($"p".isin(vs: _*))
    }
    c.ours.readAppIds.foreach(txn.txnVersion)
    val ourActions: Seq[Action] =
      c.ours.removePartitions.flatMap(p =>
        fileOf.collect { case (f, pv) if pv == p => RemoveFile(f) }) ++
      c.ours.txnAppIds.map(id => SetTransaction(id, 1L, None))
    val winningActions: Seq[Action] =
      (if (c.winning.protocol) Seq(Protocol(1, 2)) else Nil) ++
      (if (c.winning.metadata)
        Seq(log.snapshot.metadata.copy(configuration = Map("k" -> "v"))) else Nil) ++
      c.winning.adds.zipWithIndex.map { case (a, i) =>
        AddFile(path = s"p=${a.p}/win-$i.parquet",
          partitionValues = Map("p" -> a.p), size = 1L, modificationTime = 1L) } ++
      c.winning.removes.flatMap(p =>
        fileOf.collect { case (f, pv) if pv == p => RemoveFile(f) }) ++
      c.winning.txnAppIds.map(id => SetTransaction(id, 2L, None))
    try {
      new ConflictChecker(txn, winningActions, txn.readVersion + 1,
        c.isolation, ourActions).check()
      None
    } catch {
      case e: ConcurrentModificationException => Some(e.getClass)
    }
  }

  test("200 random conflict cases agree with the brute-force oracle") {
    withTempDir { dir =>
      // fixture: one file per partition value, known (path -> p) layout
      DeltaTable.write(
        pVals.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("x", "p")
          .repartition(col("p")),
        dir, partitionBy = Seq("p"))
      val log = DeltaLog.forTable(spark, dir)
      val fileOf: Map[String, String] =
        log.update().allFiles.map(f => f.path -> f.partitionValues("p")).toMap
      assert(fileOf.values.toSet == pVals.toSet)

      val prop = Prop.forAll(genCase) { c =>
        val expect = oracle(c, fileOf)
        val got = verdict(c, log, fileOf)
        if (got != expect) {
          println(s"MISMATCH case=$c expected=$expect got=$got")
        }
        got == expect
      }
      val result = SCTest.check(
        SCTest.Parameters.default
          .withMinSuccessfulTests(200)
          .withInitialSeed(org.scalacheck.rng.Seed(42L)),
        prop)
      assert(result.passed, s"scalacheck: ${result.status}")
    }
  }
}
