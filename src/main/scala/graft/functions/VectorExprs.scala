package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector kernels over `array<float>` / `array<double>`
  * embedding columns.
  *
  * Exactly the same arithmetic as the HOF formulation they replace
  * (`aggregate(zip_with(a,b,(x,y)=>xD*yD), 0d, _+_)`): every element
  * widened to double, products summed sequentially left-to-right —
  * so results stay bit-identical to the DuckDB oracle's
  * `list_sum(list_transform(...))` (SURVEY §2.12). HOFs are
  * CodegenFallback in Spark; for 64-dim embeddings the interpreted
  * lambda walk cost ~5× the arithmetic.
  *
  * Null/shape contract: null input → null; mismatched lengths → null
  * (the HOF version also nulls via zip_with's null padding).
  */
private[graft] object VectorKernels {
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def norm2(a: ArrayData, aFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x
      i += 1
    }
    acc
  }

  def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def checkVec(dt: DataType, side: String): TypeCheckResult = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$side must be ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }
}

/** Sequential-fold double dot product. */
case class VectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(VectorKernels.checkVec(left.dataType, "left"),
      VectorKernels.checkVec(right.dataType, "right"))
      .find(_ != TypeCheckResult.TypeCheckSuccess)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_dot"

  private def aF = VectorKernels.isFloatArray(left.dataType)
  private def bF = VectorKernels.isFloatArray(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""Object r = graft.functions.VectorKernels$$.MODULE$$.dot($a, $b, $aF, $bF);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) r).doubleValue(); }
         |""".stripMargin
    })
    code
  }

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Sequential-fold double sum of squares. */
case class VectorNorm2(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkVec(child.dataType, "input")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_norm2"

  private def aF = VectorKernels.isFloatArray(child.dataType)

  override def nullSafeEval(a: Any): Any =
    VectorKernels.norm2(a.asInstanceOf[ArrayData], aF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorKernels$$.MODULE$$.norm2($a, $aF)")

  override protected def withNewChildInternal(newChild: Expression): VectorNorm2 =
    copy(child = newChild)
}

object VectorExprs {
  def vectorDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VectorDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def vectorNorm2(a: Column): Column =
    GraftColumnBridge.column(VectorNorm2(GraftColumnBridge.expression(a)))
}
