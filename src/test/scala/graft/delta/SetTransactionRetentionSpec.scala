package graft.delta

import graft.SparkSpec

/** `delta.setTransactionRetentionDuration` (PROTOCOL.md "Transaction
  * Identifiers" — writers may expire them): checkpoints drop transaction
  * ids older than the retention, so a per-file ingest tracker (COPY INTO)
  * or a churning streaming appId set cannot grow the checkpoint forever.
  * Expiry requires PROOF of age — a txn without `lastUpdated` survives —
  * and with the property unset nothing ever expires. */
class SetTransactionRetentionSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 24L * 3600 * 1000

  test("checkpoint drops expired txns; fresh and age-unknown ones survive") {
    withTempDir { dir =>
      val t0 = 1700000000000L
      DeltaTable.write(Seq((1L, "a")).toDF("id", "v"), dir,
        configuration = Map(
          "delta.setTransactionRetentionDuration" -> "interval 1 days"))
      val log = DeltaLog.forTable(spark, dir)
      log.clock = () => t0

      // three identifiers: old (stamped t0), one with NO lastUpdated
      // (committed raw), and — after the clock advances — a fresh one
      DeltaTable.write(Seq((2L, "b")).toDF("id", "v"), dir,
        idempotentTxn = Some(("app-old", 7L)))
      log.startTransaction().commit(
        Seq(SetTransaction("app-no-age", 3L, None)),
        DeltaOperations.ManualUpdate)

      log.clock = () => t0 + 2 * Day
      DeltaTable.write(Seq((3L, "c")).toDF("id", "v"), dir,
        idempotentTxn = Some(("app-fresh", 9L)))

      Checkpoints.writeCheckpoint(log.update())
      DeltaLog.clearCache()
      val reloaded = DeltaLog.forTable(spark, dir)
      reloaded.clock = () => t0 + 2 * Day
      val ids = reloaded.update().setTransactions.map(_.appId).toSet
      assert(ids == Set("app-no-age", "app-fresh"),
        s"expected app-old expired, got $ids")
      // the contract consumers actually use: a retry of the expired app
      // no longer sees its version (the documented retention tradeoff)
      val txn = reloaded.startTransaction()
      assert(txn.txnVersion("app-old") == -1L)
      assert(txn.txnVersion("app-fresh") == 9L)
    }
  }

  test("unset property keeps every txn across checkpoints") {
    withTempDir { dir =>
      val t0 = 1700000000000L
      DeltaTable.write(Seq((1L, "a")).toDF("id", "v"), dir)
      val log = DeltaLog.forTable(spark, dir)
      log.clock = () => t0
      DeltaTable.write(Seq((2L, "b")).toDF("id", "v"), dir,
        idempotentTxn = Some(("app-ancient", 1L)))
      log.clock = () => t0 + 365 * Day
      Checkpoints.writeCheckpoint(log.update())
      DeltaLog.clearCache()
      val reloaded = DeltaLog.forTable(spark, dir)
      assert(reloaded.update().setTransactions.exists(_.appId == "app-ancient"))
    }
  }

  test("expiry only happens AT the checkpoint: the log itself keeps them") {
    withTempDir { dir =>
      val t0 = 1700000000000L
      DeltaTable.write(Seq((1L, "a")).toDF("id", "v"), dir,
        configuration = Map(
          "delta.setTransactionRetentionDuration" -> "interval 1 days"))
      val log = DeltaLog.forTable(spark, dir)
      log.clock = () => t0
      DeltaTable.write(Seq((2L, "b")).toDF("id", "v"), dir,
        idempotentTxn = Some(("app-old", 7L)))
      log.clock = () => t0 + 2 * Day
      // no checkpoint between: replaying raw commits still sees the txn
      // (expiry is a fold-compaction decision, not a read-time filter)
      DeltaLog.clearCache()
      val reloaded = DeltaLog.forTable(spark, dir)
      assert(reloaded.update().setTransactions.exists(_.appId == "app-old"))
    }
  }
}
