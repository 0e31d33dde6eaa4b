package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Interns a string array against a DRIVER-BUILT dictionary, returning the
  * ascending-sorted `array<int>` of ids; strings absent from the
  * dictionary are dropped.
  *
  * This is the shuffle-elimination half of gram interning: the dictionary
  * comes from the one global frequency aggregation the near-dup operators
  * already run (and collect, because the id table must be totally ordered
  * by rarity). Re-attaching ids by `explode → broadcast join → groupBy
  * collect_list` would shuffle every gram occurrence of the corpus a
  * SECOND time just to rebuild per-doc arrays; a per-row lookup against
  * the same driver-resident dictionary produces identical arrays with no
  * shuffle at all. The dictionary travels in the expression (task-closure
  * broadcast) — valid in exactly the regime the collect is: the distinct
  * universe fits the driver, which bounds both designs together.
  *
  * Real `doGenCode` (a call into [[InternSortedIds.intern]] with the
  * expression bound as a reference object), NOT CodegenFallback: this
  * expression sits at the BOTTOM of the near-dup candidate pipeline
  * (projection → bitset → posexplode → prefix join), and one fallback
  * expression turns the whole-stage-codegen of everything above it off —
  * measured as the 49M-row prefix join running interpreted, ~5 s of the
  * operator's 6 s.
  */
case class InternSortedIds(child: Expression, dict: Map[String, Int])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"intern_sorted_ids requires an array<string> argument, got ${other.simpleString}")
    }

  // binary-comparable lookup keys, built once per task deserialization
  @transient private lazy val lookup: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](dict.size * 2)
    dict.foreach { case (s, i) => m.put(UTF8String.fromString(s), Integer.valueOf(i)) }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    intern(input.asInstanceOf[ArrayData])

  /** One document's interning: lookup + int sort (instance method so the
    * per-task lookup table is shared between interpreted and codegen). */
  def intern(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val ids = new Array[Int](n)
    var i = 0; var k = 0
    while (i < n) {
      val id = lookup.get(a.getUTF8String(i))
      if (id != null) { ids(k) = id.intValue(); k += 1 }
      i += 1
    }
    val out = if (k == n) ids else java.util.Arrays.copyOf(ids, k)
    java.util.Arrays.sort(out)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("internExpr", this, classOf[InternSortedIds].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.intern($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): InternSortedIds =
    copy(child = newChild)

  // the dictionary is payload, not plan structure: the default
  // case-class toString stringifies the WHOLE map into every plan string
  // (explain, SQL-listener plan events, codegen comments) — profiled at
  // ~3 s per dedup_containment execution at sf0.1 (~1M-entry dict). Show
  // its size only; equality/semanticHash still use the full map via
  // productIterator, so plan semantics are unchanged.
  override def flatArguments: Iterator[Any] =
    Iterator(child, s"dict[${dict.size}]")
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"dict[${dict.size}]")
  override def toString: String = s"intern_sorted_ids($child, dict[${dict.size}])"
}

object InternSortedIds {
  def apply(a: Column, dict: Map[String, Int]): Column =
    Shims.column(InternSortedIds(Shims.expression(a), dict))
}
