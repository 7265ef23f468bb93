package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-gram shingler.
  *
  * Semantically identical to the HOF pipeline
  * `transform(sequence(...), i -> concat_ws(' ', tokens[i..i+n-1]))`
  * over single-space-split non-empty tokens (TextFns.shingles), but
  * evaluated as one tight loop per row instead of an interpreted
  * lambda tree — higher-order functions are CodegenFallback in
  * Spark, and the interpreted walk dominated shingle-heavy queries.
  * Map-side only (no shuffle introduced): the right shape for
  * corpus-scale dedup where shingling runs over every document.
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[UTF8String], n)

  // NB: must call through MODULE$ — the companion gets no static
  // forwarder for a name that collides with an instance method, and
  // Janino would resolve a bare `WordShingles.x` against the case
  // class's instance methods and fail to compile (killing whole-stage
  // codegen for every plan containing this expression).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles$$.MODULE$$.shingle($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Shared by interpreted + generated code paths. */
  def shingle(text: UTF8String, n: Int): ArrayData = {
    // split on single spaces, drop empty tokens (the reference's
    // empty-value filter, clients/exclusion_requests.py:158)
    val raw = text.toString.split(' ')
    val toks = new java.util.ArrayList[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) toks.add(raw(i))
      i += 1
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.get(i + k))
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column↔Expression bridge (Spark 4 classic API via GraftColumnBridge). */
  def apply(c: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(c), n))
}
