package graft.sql

import org.apache.spark.sql.types.{StructField, StructType}

/** Nested-path schema surgery for ALTER TABLE (F9): the reference records
  * these as `ADD COLUMNS` / `CHANGE COLUMN` operations
  * (`standalone/src/main/java/io/delta/standalone/Operation.java:44-92`);
  * the transforms themselves are pure StructType rewrites — old parquet
  * files decode added nested fields as null, so adds must be nullable
  * (enforced by the caller and by the commit's write-compat check). */
private[sql] object SchemaAlter {

  /** Insert `field` at the struct addressed by `path` (empty = top level). */
  def addAt(schema: StructType, path: Seq[String], field: StructField): StructType = {
    if (path.isEmpty) {
      require(!schema.fieldNames.contains(field.name),
        s"Column ${field.name} already exists")
      schema.add(field)
    } else {
      val head = path.head
      require(schema.fieldNames.contains(head),
        s"No column $head to add a nested field to")
      StructType(schema.fields.map { f =>
        if (f.name != head) f
        else f.dataType match {
          case inner: StructType =>
            f.copy(dataType = addAt(inner, path.tail, field))
          case other => throw new IllegalArgumentException(
            s"Column $head is ${other.simpleString}, not a struct")
        }
      })
    }
  }

  /** Apply `change` to the field addressed by `path`. */
  def updateAt(schema: StructType, path: Seq[String],
               change: StructField => StructField): StructType = {
    require(path.nonEmpty, "Empty field path")
    val head = path.head
    require(schema.fieldNames.contains(head), s"Unknown column $head")
    StructType(schema.fields.map { f =>
      if (f.name != head) f
      else if (path.size == 1) change(f)
      else f.dataType match {
        case inner: StructType =>
          f.copy(dataType = updateAt(inner, path.tail, change))
        case other => throw new IllegalArgumentException(
          s"Column $head is ${other.simpleString}, not a struct")
      }
    })
  }
}
