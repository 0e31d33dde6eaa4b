package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle builders: one efficient per-ROW evaluation instead of
  * per-ELEMENT interpreted lambdas.
  *
  * The composed form — `array_sort(array_distinct(transform(sequence(...),
  * i => substr/slice...)))` — evaluates every element through the
  * interpreted expression walker with boxing, and each `substr(i)` rescans
  * the string; building shingles dominated the near-dup operators' time.
  * These expressions do one pass per document: walk the UTF-8 bytes once
  * (code-point offsets), slice windows, de-duplicate and sort into the
  * UTF8String binary order [[SortedArrayJaccard]] expects. CodegenFallback
  * is fine here — the fallback cost is per row, and rows are documents.
  *
  * Semantics match the composed form exactly: code-point windows, distinct,
  * ascending byte order; shorter-than-n input → empty array.
  */
case class CharShinglesSorted(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_shingles requires a string argument, got ${child.dataType.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    // offsets of each code point start, plus the end sentinel
    val offsets = new java.util.ArrayList[Integer](bytes.length + 1)
    var i = 0
    while (i < bytes.length) {
      offsets.add(i)
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offsets.add(bytes.length)
    val chars = offsets.size - 1
    if (chars < n) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[UTF8String]()
    var c = 0
    while (c + n <= chars) {
      val from = offsets.get(c)
      val until = offsets.get(c + n)
      set.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, from, until)))
      c += 1
    }
    new GenericArrayData(set.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): CharShinglesSorted =
    copy(child = newChild)
}

/** Word n-gram shingles from a pre-tokenized array<string> column:
  * join each n-token window with single spaces, distinct, byte-order
  * sorted. Null tokens are skipped (the tokenizer never produces them). */
case class WordShinglesSorted(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles requires array<string>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val count = arr.numElements()
    if (count < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](count)
    var i = 0
    while (i < count) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val space = UTF8String.fromString(" ")
    val set = new java.util.TreeSet[UTF8String]()
    var c = 0
    while (c + n <= count) {
      val window = new Array[UTF8String](n)
      System.arraycopy(toks, c, window, 0, n)
      set.add(UTF8String.concatWs(space, window: _*))
      c += 1
    }
    new GenericArrayData(set.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): WordShinglesSorted =
    copy(child = newChild)
}

object ShingleExpressions {
  def charShinglesSorted(text: Column, n: Int): Column =
    Shims.column(CharShinglesSorted(Shims.expression(text), n))
  def wordShinglesSorted(toks: Column, n: Int): Column =
    Shims.column(WordShinglesSorted(Shims.expression(toks), n))
}
