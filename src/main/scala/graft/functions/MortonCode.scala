package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Codegen'd 2-D Morton (Z-order) interleave: bit-interleaves two
  * 32-bit bucket ids into one 64-bit z-value, so sorting by the
  * z-value clusters rows that are close in BOTH dimensions. Pure
  * integer bit-twiddling (the classic mask-spread sequence), no
  * allocation, whole-stage-codegen friendly — the right shape for a
  * write-path expression that runs over every row of a 100 TB
  * rewrite.
  */
case class MortonCode(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"morton_code expects (INT, INT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType
  override def prettyName: String = "morton_code"

  override def nullSafeEval(a: Any, b: Any): Any =
    MortonCode.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  // call through MODULE$ — see WordShingles.doGenCode for why a bare
  // companion reference breaks Janino here
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.MortonCode$$.MODULE$$.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonCode =
    copy(left = newLeft, right = newRight)
}

object MortonCode {
  /** Spread the low 32 bits of x to the even bit positions of a long. */
  def spread(x0: Int): Long = {
    var x = x0.toLong & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** z = a's bits on even positions, b's on odd. */
  def interleave(a: Int, b: Int): Long =
    spread(a) | (spread(b) << 1)

  /** Column↔Expression bridge (Spark 4 classic API via GraftColumnBridge). */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(MortonCode(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
