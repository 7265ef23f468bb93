package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.WordShingles

/** Library registration surface: makes graft's custom Catalyst
  * expressions available to SQL users, either at session build time
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or via config, no code change:
  *   // spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * or on an existing session with [[GraftExtensions.register]].
  * After registration: `SELECT word_shingles(text, 3) FROM docs`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction(GraftExtensions.wordShinglesFunction)
}

object GraftExtensions {
  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, info, builder) triple for injectFunction. */
  val wordShinglesFunction: (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => Expression) = (
    FunctionIdentifier("word_shingles"),
    new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
    (args: Seq[Expression]) => args match {
      case Seq(text) => WordShingles(text, 3)
      case Seq(text, n) => WordShingles(text, intArg(n, "shingle width"))
      case _ => throw new IllegalArgumentException(
        "word_shingles(text[, n]) takes 1 or 2 arguments")
    })

  /** Imperative registration for an already-built session. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = wordShinglesFunction
    spark.sessionState.functionRegistry
      .registerFunction(id, info, builder)
  }
}
