package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._

/** Dot product of two numeric vectors as one codegen'd loop.
  *
  * Bit-identical to the higher-order formulation
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double)*y.cast(double)), 0.0, +)`
  * — same element order, same double accumulation — but runs inside
  * whole-stage codegen instead of the interpreted lambda path, which is
  * the hot loop of every cosine-similarity operator (ANN, embedding
  * near-dup) at corpus scale.
  *
  * Accepts array<float> / array<double> on either side. Null if either
  * array is null, lengths differ, or any element is null.
  */
case class VectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vector_dot requires array<float>/array<double> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += get(x, i, elemType(left).get) * get(y, i, elemType(right).get)
      i += 1
    }
    acc
  }

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
    }
    val i = ctx.freshName("i"); val n = ctx.freshName("n")
    val acc = ctx.freshName("acc"); val anyNull = ctx.freshName("anyNull")
    val resultCode =
      code"""
        |${leftGen.code}
        |${rightGen.code}
        |boolean ${ev.isNull} = true;
        |double ${ev.value} = 0.0;
        |if (!${leftGen.isNull} && !${rightGen.isNull}) {
        |  final int $n = ${leftGen.value}.numElements();
        |  if (${rightGen.value}.numElements() == $n) {
        |    double $acc = 0.0;
        |    boolean $anyNull = false;
        |    for (int $i = 0; $i < $n; $i++) {
        |      if (${leftGen.value}.isNullAt($i) || ${rightGen.value}.isNullAt($i)) {
        |        $anyNull = true; break;
        |      }
        |      $acc += ${getter(elemType(left).get, leftGen.value.toString, i)} *
        |              ${getter(elemType(right).get, rightGen.value.toString, i)};
        |    }
        |    if (!$anyNull) { ${ev.isNull} = false; ${ev.value} = $acc; }
        |  }
        |}
       """.stripMargin
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  def apply(a: Column, b: Column): Column =
    Shims.column(VectorDot(Shims.expression(a), Shims.expression(b)))
}
