package graft.delta

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WRITE-side cross-implementation proof (ref:
  * oss-compatibility-tests/OSSCompatibilitySuite.scala:59-197 — two
  * implementations sharing one table). No second engine ships in this
  * container, so the write half is proven at the ACTION level: the
  * `_delta_log` JSON this engine commits must match the protocol's
  * field shapes exactly, and the checkpoint parquet must round-trip
  * through a REFERENCE-shaped reader schema (one that has never heard
  * of our extra columns) to the identical state — a foreign replay
  * implemented independently in this spec, not via our codecs. */
class GoldenWriteCompatSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = JsonCodec.mapper

  private def logLines(dir: String): Seq[(String, Map[String, Any])] = {
    new java.io.File(s"$dir/_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).sortBy(_.getName).toSeq
      .flatMap { f =>
        java.nio.file.Files.readAllLines(f.toPath).asScala
          .filter(_.trim.nonEmpty).map { line =>
            val node = mapper.readTree(line)
            val names = node.fieldNames().asScala.toList
            assert(names.size == 1,
              s"an action line must wrap exactly one action: $line")
            (names.head,
              mapper.convertValue(node.get(names.head),
                classOf[java.util.Map[String, Any]]).asScala.toMap)
          }
      }
  }

  test("commit JSON matches the protocol's action field shapes") {
    withTempDir { dir =>
      DeltaTable.write(
        Seq((1, "a", 1.5), (2, "b", 2.5)).toDF("id", "part", "x"),
        dir, partitionBy = Seq("part"))
      DeltaTable.write(Seq((3, "a", 3.5)).toDF("id", "part", "x"), dir)
      DeltaTable.forPath(spark, dir).delete($"id" === 1)

      val lines = logLines(dir)
      val kinds = lines.map(_._1).toSet
      assert(Set("protocol", "metaData", "add", "remove", "commitInfo")
        .subsetOf(kinds), s"kinds: $kinds")
      assert(kinds.subsetOf(Set("protocol", "metaData", "add", "remove",
        "commitInfo", "txn", "cdc")), s"unknown action kinds: $kinds")

      val protocol = lines.collect { case ("protocol", m) => m }
      assert(protocol.size == 1)
      assert(protocol.head("minReaderVersion") == 1)
      assert(protocol.head("minWriterVersion") == 2)

      val metaData = lines.collect { case ("metaData", m) => m }.head
      assert(metaData("id").asInstanceOf[String].nonEmpty)
      assert(metaData("format").asInstanceOf[
        scala.collection.Map[String, Any]]("provider") == "parquet")
      // the schema string parses as a Spark StructType (what delta-spark
      // stores and re-parses)
      val parsed = org.apache.spark.sql.types.DataType
        .fromJson(metaData("schemaString").asInstanceOf[String])
      assert(parsed.isInstanceOf[org.apache.spark.sql.types.StructType])
      assert(metaData("partitionColumns") == Seq("part"))

      lines.collect { case ("add", m) => m }.foreach { add =>
        assert(add("path").asInstanceOf[String].nonEmpty)
        assert(!add("path").asInstanceOf[String].startsWith("/"),
          "add paths must be table-relative")
        assert(add("size").asInstanceOf[Number].longValue > 0)
        assert(add("modificationTime").asInstanceOf[Number].longValue > 0)
        assert(add.contains("dataChange"))
        val pv = add("partitionValues").asInstanceOf[
          scala.collection.Map[String, Any]]
        assert(pv.keySet == Set("part"), s"partitionValues: $pv")
        // our in-memory/checkpoint-only column must NEVER leak into JSON
        assert(!add.contains("stats_parsed"),
          "stats_parsed is checkpoint-only, not commit JSON")
      }
      lines.collect { case ("remove", m) => m }.foreach { rm =>
        assert(rm("deletionTimestamp").asInstanceOf[Number].longValue > 0)
        assert(rm.contains("dataChange"))
      }
      lines.collect { case ("commitInfo", m) => m }.foreach { ci =>
        assert(ci.contains("timestamp"))
        assert(ci.contains("operation"))
      }
    }
  }

  test("idempotent writes record protocol-shaped txn actions") {
    withTempDir { dir =>
      DeltaTable.write(Seq(1).toDF("v"), dir,
        idempotentTxn = Some(("app-1", 7L)))
      val txns = logLines(dir).collect { case ("txn", m) => m }
      assert(txns.size == 1)
      assert(txns.head("appId") == "app-1")
      assert(txns.head("version").asInstanceOf[Number].longValue == 7L)
    }
  }

  test("operationParameters and metric names conform per operation " +
      "(ref Operation.java:110-338)") {
    import org.apache.spark.sql.functions._
    // the reference's Metrics vocabulary plus our documented byte-count
    // extras (delta-spark records the same numAddedBytes/numRemovedBytes)
    val metricVocab = Set(
      "numFiles", "numOutputBytes", "numOutputRows", "numAddedFiles",
      "numRemovedFiles", "numDeletedRows", "numCopiedRows",
      "executionTimeMs", "scanTimeMs", "rewriteTimeMs",
      "numConvertedFiles", "numSourceRows", "numTargetRowsInserted",
      "numTargetRowsUpdated", "numTargetRowsDeleted", "numTargetRowsCopied",
      "numTargetFilesAdded", "numTargetFilesRemoved", "numUpdatedRows",
      "numAddedBytes", "numRemovedBytes", "numCopiedFiles",
      "numRestoredFiles")
    withTempDir { dir =>
      import spark.implicits._
      val t = s"$dir/t"
      DeltaTable.write((1 to 20).map(i => (i.toLong, i % 4, s"v$i"))
        .toDF("id", "part", "v"), t, partitionBy = Seq("part"))
      val table = DeltaTable.forPath(spark, t)
      table.delete($"id" === 3L)                                // rewrite DELETE
      table.update($"id" === 5L, Map("v" -> lit("up")))         // UPDATE
      table.merge(Seq((5L, 1, "m")).toDF("id", "part", "v"),
        $"t.id" === $"s.id")
        .whenMatchedUpdate(Map("v" -> $"s.v"))
        .whenNotMatchedInsertAll().execute()                    // MERGE
      table.compact()                                           // OPTIMIZE
      table.compact(zOrderBy = Seq("id"))                       // OPTIMIZE+z
      table.restore(1L)                                         // RESTORE
      table.addConstraint("pos", "id > 0")                      // ADD CONSTRAINT
      table.dropConstraint("pos")                               // DROP CONSTRAINT
      table.cloneTo(s"$dir/t2")                                 // CLONE

      val hist = table.history()
        .select("operation", "operationParameters", "operationMetrics")
        .collect()
        .map(r => (r.getString(0), r.getMap[String, String](1),
          r.getMap[String, String](2)))

      def paramsOf(op: String): Map[String, String] =
        hist.filter(_._1 == op).map(_._2).headOption
          .map(m => m.keys.map(k => k -> m(k)).toMap)
          .getOrElse(fail(s"no $op commit in history"))

      // WRITE family: mode + partitionBy — delta-spark's rendering
      // (string values verbatim, lists JSON-encoded)
      assert(paramsOf("CREATE TABLE") ==
        Map("mode" -> "Append", "partitionBy" -> "[\"part\"]"))
      // DML predicates render as a JSON-encoded ARRAY of strings
      // (delta-spark's DESCRIBE HISTORY convention: ["(id > 5)"])
      Seq("DELETE", "UPDATE", "MERGE").foreach { op =>
        assert(paramsOf(op).keySet == Set("predicate"))
        val rendered = paramsOf(op)("predicate")
        assert(rendered.startsWith("[\"") && rendered.endsWith("\"]"),
          s"$op predicate not a JSON string array: $rendered")
      }
      assert(paramsOf("RESTORE") == Map("version" -> "1"))
      assert(paramsOf("ADD CONSTRAINT") ==
        Map("name" -> "pos", "expr" -> "id > 0"))
      assert(paramsOf("DROP CONSTRAINT").keySet == Set("name", "existed"))
      val cloneHist = DeltaTable.forPath(spark, s"$dir/t2").history()
        .select("operation", "operationParameters").collect()
        .map(r => (r.getString(0), r.getMap[String, String](1)))
      assert(cloneHist.filter(_._1 == "CLONE").head._2.keySet ==
        Set("source", "sourceVersion"))
      val optParams = hist.filter(_._1 == "OPTIMIZE").map(_._2)
      assert(optParams.exists(_.get("zOrderBy").contains("[\"id\"]")),
        s"zOrderBy param missing: ${optParams.mkString(";")}")

      // every metric name across every commit comes from the vocabulary
      hist.foreach { case (op, _, metrics) =>
        val alien = metrics.keys.filterNot(metricVocab)
        assert(alien.isEmpty, s"$op records non-vocabulary metrics: $alien")
      }
    }
  }

  test("checkpoint parquet round-trips through a foreign reader schema " +
      "and an independent replay reaches the same state") {
    withTempDir { dir =>
      (1 to 12).foreach(i =>
        DeltaTable.write(Seq((i, s"p${i % 3}")).toDF("id", "part"), dir,
          partitionBy = if (i == 1) Seq("part") else Nil))
      DeltaTable.forPath(spark, dir).delete($"part" === "p0")
      val log = DeltaLog.forTable(spark, dir)
      Checkpoints.writeCheckpoint(log.update())

      // _last_checkpoint is the protocol's JSON hint
      val lc = mapper.readTree(java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(s"$dir/_delta_log/_last_checkpoint"))
        .get(0))
      val cpVersion = lc.get("version").asLong
      assert(lc.get("size").asLong > 0)

      // a REFERENCE-shaped reader: the fields the reference's
      // CheckpointReader decodes (standalone's SingleAction — it has
      // never heard of stats_parsed) read the checkpoint cleanly
      import org.apache.spark.sql.types._
      val foreignAdd = StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType),
        StructField("stats", StringType)))
      val foreignSchema = StructType(Seq(
        StructField("add", foreignAdd),
        StructField("remove", StructType(Seq(
          StructField("path", StringType),
          StructField("deletionTimestamp", LongType),
          StructField("dataChange", BooleanType)))),
        StructField("metaData", StructType(Seq(
          StructField("id", StringType),
          StructField("schemaString", StringType),
          StructField("partitionColumns", ArrayType(StringType))))),
        StructField("protocol", StructType(Seq(
          StructField("minReaderVersion", IntegerType),
          StructField("minWriterVersion", IntegerType))))))
      val cpPath = f"$dir/_delta_log/$cpVersion%020d.checkpoint.parquet"
      val cp = spark.read.schema(foreignSchema).parquet(cpPath)
      assert(cp.filter($"protocol".isNotNull).count() == 1)
      assert(cp.filter($"metaData".isNotNull).count() == 1)

      // independent newest-wins replay over checkpoint + later commits
      // (none here — checkpoint is at head): active set must equal what
      // OUR snapshot reports
      val foreignActive = cp.filter($"add".isNotNull)
        .select($"add.path").as[String].collect().toSet
      val ours = log.update().allFiles.map(_.path).toSet
      assert(foreignActive == ours,
        s"foreign read differs: ${foreignActive.diff(ours)} / ${ours.diff(foreignActive)}")

      // and the checkpoint's add rows carry usable stats for a foreign
      // reader (raw JSON string preserved alongside our parsed column)
      assert(cp.filter($"add".isNotNull && $"add.stats".isNotNull).count() > 0)
    }
  }
}
