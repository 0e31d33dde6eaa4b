package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Fixed-width bitset over a BOUNDED dense-int universe: element `g`
  * (1-based interned id) sets bit `g` of an `array<long>` of exactly
  * `words` words.
  *
  * Near-dup verification over interned gram ids degenerates when the gram
  * alphabet is tiny (short n-grams, small character set): candidate volume
  * approaches all-pairs and each verification walks two ~|doc|-length int
  * arrays. When the UNIVERSE of distinct grams is small — known exactly at
  * plan time, because the interning table is driver-built — the whole set
  * fits in `(maxId >> 6) + 1` longs, set intersection/union become
  * word-wise AND/OR popcounts, and the per-candidate payload shrinks from
  * O(|doc|) ints to O(universe/64) longs regardless of document length.
  */
case class IntArrayBitset(child: Expression, words: Int)
  extends UnaryExpression {

  require(words >= 1, "bitset width must be >= 1 word")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int_array_bitset requires an array<int> argument, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val w = new Array[Long](words)
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val g = a.getInt(i)
      if (g < 0 || (g >>> 6) >= words) IntArrayBitset.outOfRange(g, words)
      w(g >>> 6) |= (1L << (g & 63))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(w)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.freshName("w"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val g = ctx.freshName("g")
      s"""
         |final long[] $w = new long[$words];
         |final int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  final int $g = $a.getInt($i);
         |  if ($g < 0 || ($g >>> 6) >= $words) {
         |    graft.functions.IntArrayBitset.outOfRange($g, $words);
         |  }
         |  $w[$g >>> 6] |= (1L << ($g & 63));
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($w);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IntArrayBitset =
    copy(child = newChild)
}

object IntArrayBitset {
  def apply(a: Column, words: Int): Column =
    Shims.column(IntArrayBitset(Shims.expression(a), words))

  /** Loud refusal for an id outside the declared universe — reachable
    * from generated code, so it cannot be private. An out-of-range id
    * means the interning dictionary and the declared width disagree
    * (caller bug or corrupt data); a bare ArrayIndexOutOfBounds from the
    * hot loop names neither. */
  def outOfRange(id: Int, words: Int): Nothing =
    throw new IllegalArgumentException(
      s"int_array_bitset: interned id $id is outside the declared " +
        s"universe [0, ${words * 64}) (width $words words); the " +
        "interning dictionary and the bitset width disagree")
}

/** Exact jaccard of two equal-width `array<long>` bitsets:
  * `popcount(a AND b) / popcount(a OR b)`, word-wise, codegen'd.
  *
  * With `inter = popcount(a&b)` and `union = popcount(a|b) =
  * |a| + |b| - inter`, the value is the same double as
  * [[SortedArrayJaccard]] computes on the underlying sorted id arrays —
  * callers can switch representations without output drift. Both-empty
  * inputs yield NaN (as does 0/0 in the array form).
  */
case class BitsetJaccard(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitset_jaccard requires two array<long> arguments, got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var inter = 0; var union = 0
    while (i < n) {
      val xi = x.getLong(i); val yi = y.getLong(i)
      inter += java.lang.Long.bitCount(xi & yi)
      union += java.lang.Long.bitCount(xi | yi)
      i += 1
    }
    // trailing words of the longer side belong to the union only
    var j = n
    val (longer, nl) = if (x.numElements() > n) (x, x.numElements()) else (y, y.numElements())
    while (j < nl) { union += java.lang.Long.bitCount(longer.getLong(j)); j += 1 }
    inter.toDouble / union.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val inter = ctx.freshName("inter"); val union = ctx.freshName("union")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |final int $n = java.lang.Math.min($na, $nb);
         |int $inter = 0; int $union = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $xi = $a.getLong($i);
         |  final long $yi = $b.getLong($i);
         |  $inter += java.lang.Long.bitCount($xi & $yi);
         |  $union += java.lang.Long.bitCount($xi | $yi);
         |}
         |for (int $i = $n; $i < $na; $i++) {
         |  $union += java.lang.Long.bitCount($a.getLong($i));
         |}
         |for (int $i = $n; $i < $nb; $i++) {
         |  $union += java.lang.Long.bitCount($b.getLong($i));
         |}
         |${ev.value} = (double) $inter / (double) $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitsetJaccard =
    copy(left = newLeft, right = newRight)
}

object BitsetJaccard {
  def apply(a: Column, b: Column): Column =
    Shims.column(BitsetJaccard(Shims.expression(a), Shims.expression(b)))
}
