package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{SortedArrayJaccard, VectorDot}

/** SparkSessionExtensions hook: registers the engine's native expressions
  * as SQL functions, so the `spark.sql` surface reaches them too:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)        // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * ...
  * spark.sql("SELECT vector_dot(a, b) FROM vectors")
  * }}}
  *
  * This is the documented extension path (SURVEY §2.7): custom operators
  * too hot for composed built-ins become Catalyst expressions with
  * codegen, surfaced through both the Column API and SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def two(name: String, f: (Expression, Expression) => Expression)
    : Seq[Expression] => Expression = { children =>
    require(children.size == 2, s"$name(a, b) takes 2 arguments")
    f(children(0), children(1))
  }

  private[graft] val definitions: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("sorted_array_jaccard"),
      new ExpressionInfo(classOf[SortedArrayJaccard].getName, "sorted_array_jaccard"),
      two("sorted_array_jaccard", SortedArrayJaccard.apply)),
    (new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      two("vector_dot", VectorDot.apply)))

  /** Register the functions on an already-running session (the
    * `spark.sql.extensions` config only applies at session build time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    definitions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
