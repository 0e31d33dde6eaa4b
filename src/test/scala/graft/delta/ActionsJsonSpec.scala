package graft.delta

import org.scalatest.funsuite.AnyFunSuite

class ActionsJsonSpec extends AnyFunSuite {

  test("AddFile round-trips through the envelope JSON") {
    val a = AddFile("part-0.parquet", Map("day" -> "2026-01-01"), 123L, 456L,
      dataChange = true, stats = Some("""{"numRecords":10}"""))
    val json = JsonCodec.toJson(a)
    assert(json.startsWith("""{"add":"""))
    assert(JsonCodec.actionFromJson(json) == a)
  }

  test("RemoveFile with defaults omits absent optionals") {
    val r = RemoveFile("f.parquet", Some(99L))
    val json = JsonCodec.toJson(r)
    assert(!json.contains("tags"))
    assert(JsonCodec.actionFromJson(json) == r)
  }

  test("Metadata round-trips schema, partition columns and configuration") {
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("day", "string")
    val m = Metadata(schemaString = Some(schema.json),
      partitionColumns = Seq("day"),
      configuration = Map("delta.appendOnly" -> "true"),
      createdTime = Some(1L))
    val back = JsonCodec.actionFromJson(JsonCodec.toJson(m)).asInstanceOf[Metadata]
    assert(back == m)
    assert(back.schema == schema)
    assert(back.partitionSchema.fieldNames.toSeq == Seq("day"))
    assert(back.dataSchema.fieldNames.toSeq == Seq("id"))
  }

  test("Protocol / SetTransaction / CommitInfo round-trip") {
    for (a <- Seq[Action](Protocol(1, 2), SetTransaction("app", 7, Some(1L)),
        CommitInfo(operation = Some("WRITE"), isBlindAppend = Some(true)))) {
      assert(JsonCodec.actionFromJson(JsonCodec.toJson(a)) == a)
    }
  }

  test("unknown fields from other writers are ignored") {
    val json = """{"add":{"path":"p.parquet","size":1,"modificationTime":2,
      "dataChange":true,"partitionValues":{},"futureField":{"x":1}}}"""
      .replaceAll("\n\\s*", "")
    val a = JsonCodec.actionFromJson(json).asInstanceOf[AddFile]
    assert(a.path == "p.parquet")
  }

  test("null partition value survives the round trip") {
    val a = AddFile("p", Map("day" -> null), 1, 2, dataChange = true)
    val back = JsonCodec.actionFromJson(JsonCodec.toJson(a)).asInstanceOf[AddFile]
    assert(back.partitionValues == Map("day" -> null))
  }
}
