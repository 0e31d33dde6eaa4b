package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of `bits`-bit bucket coordinates — the clustering
  * key with strictly better locality than Morton interleaving: every
  * step along the curve moves exactly one coordinate by one bucket, so
  * consecutive rows land in adjacent hyper-boxes and per-file min/max
  * boxes stay tighter than a z-order layout's (Morton takes long
  * diagonal jumps at power-of-two boundaries). Used by OPTIMIZE on
  * liquid-clustered tables; explicit ZORDER BY keeps Morton for
  * compatibility with its name.
  *
  * Algorithm: John Skilling, "Programming the Hilbert curve" (AIP Conf.
  * Proc. 707, 2004) — the public-domain transpose formulation; the
  * index is the bit-interleave of the transposed coordinates. Codegen'd
  * as a single static call so the clustering projection stays inside
  * whole-stage codegen.
  *
  * Null/out-of-range coordinates clamp to bucket 0 / the top bucket —
  * clustering keys only ORDER rows, so clamping is always safe. */
case class HilbertIndex(children: Seq[Expression], bits: Int)
  extends Expression {

  require(children.nonEmpty && children.size * bits <= 62,
    s"hilbert_index supports up to ${62 / bits} coordinates at $bits bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == LongType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "hilbert_index requires long bucket coordinates")
    }

  override def eval(input: InternalRow): Any = {
    val coords = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      coords(i) = if (v == null) 0L else v.asInstanceOf[Long]
      i += 1
    }
    HilbertIndex.index(bits, coords)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("hilbertCoords")
    val assigns = evals.zipWithIndex.map { case (e, i) =>
      s"$arr[$i] = ${e.isNull} ? 0L : ${e.value};"
    }.mkString("\n")
    ev.copy(
      code = code"""
        ${evals.map(_.code).mkString("\n")}
        long[] $arr = new long[${children.length}];
        $assigns
        long ${ev.value} =
          graft.functions.HilbertIndex.index($bits, $arr);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndex =
    copy(children = newChildren)
}

object HilbertIndex {

  /** Hilbert index of `x` (each coordinate `bits` bits; clamped). Public
    * and static so generated code can call it. */
  def index(bits: Int, x: Array[Long]): Long = {
    val n = x.length
    val max = (1L << bits) - 1
    val X = new Array[Long](n)
    var i = 0
    while (i < n) {
      X(i) = if (x(i) < 0) 0L else if (x(i) > max) max else x(i)
      i += 1
    }
    // Skilling AxesToTranspose: inverse-undo excess work, in place
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((X(i) & q) != 0) X(0) ^= p
        else { val t = (X(0) ^ X(i)) & p; X(0) ^= t; X(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    i = 1
    while (i < n) { X(i) ^= X(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((X(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { X(i) ^= t; i += 1 }
    // transpose -> index: MSB-first interleave across coordinates
    var h = 0L
    var b = bits - 1
    while (b >= 0) {
      var j = 0
      while (j < n) { h = (h << 1) | ((X(j) >> b) & 1L); j += 1 }
      b -= 1
    }
    h
  }

  def apply(cols: Seq[Column], bits: Int): Column =
    Shims.column(HilbertIndex(cols.map(Shims.expression), bits))
}
