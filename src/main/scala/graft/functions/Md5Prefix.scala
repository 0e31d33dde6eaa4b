package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The numeric value of the first `hexChars` hex digits of `md5(input)`,
  * as a non-negative long (`hexChars` ≤ 15, so the value fits a signed
  * 64-bit int).
  *
  * Semantically identical to `conv(substring(md5(x), 1, n), 16, 10)` —
  * the deterministic hash family every dedup/curation operator and its
  * DuckDB oracle mirror are built on — but computed straight from the
  * digest bytes: the hex rendering of the full digest, the substring
  * copy, and conv's string→long parse (three allocations per ELEMENT of
  * every exploded token/shingle column) never materialize. Verified
  * equal to the composed form by Md5PrefixSpec.
  */
case class Md5Prefix(child: Expression, hexChars: Int)
  extends UnaryExpression {

  require(hexChars >= 1 && hexChars <= 15,
    "md5_prefix supports 1..15 hex chars (must fit a signed long)")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_prefix requires a string argument, got ${child.dataType.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix.hash(input.asInstanceOf[UTF8String], hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Prefix.hash($c, $hexChars)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix =
    copy(child = newChild)
}

object Md5Prefix {

  private val digestPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First `hexChars` hex digits of md5 as a long: the leading
    * ceil(hexChars/2) digest bytes big-endian, dropping the low nibble
    * when `hexChars` is odd. */
  def hash(s: UTF8String, hexChars: Int): Long = {
    val md = digestPool.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    val nBytes = (hexChars + 1) / 2
    var v = 0L
    var i = 0
    while (i < nBytes) {
      v = (v << 8) | (digest(i) & 0xffL)
      i += 1
    }
    if ((hexChars & 1) == 1) v >>>= 4
    v
  }

  def apply(c: Column, hexChars: Int): Column =
    Shims.column(Md5Prefix(Shims.expression(c), hexChars))
}
