package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd deflate-size probe: the byte count of
  * `deflate(utf8(text))` at the default zlib level, raw stream (no
  * zlib header). Dividing by `octet_length(text)` gives the
  * compression-ratio quality signal web-corpus pipelines use to
  * flag low-entropy machine text.
  *
  * Determinism: zlib output is a pure function of (input, level,
  * strategy) for a given zlib build, and the JDK pins its bundled
  * zlib per JVM — so the value is stable within a run and across
  * executors of one cluster (same JVM image). Because it is not
  * pinned across *different* JVM builds, the consuming query is
  * declared rows-only rather than oracle-hashed.
  *
  * Per-row cost is the only cost: the expression allocates nothing
  * per call (thread-local Deflater + scratch buffer, reset per row)
  * and introduces no shuffle — a pure map over the corpus scan.
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_size expects STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_size"

  override def nullSafeEval(input: Any): Any =
    DeflateSize.deflatedSize(input.asInstanceOf[UTF8String])

  // call through MODULE$ — see WordShingles.doGenCode for why a bare
  // companion reference breaks Janino here
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DeflateSize$$.MODULE$$.deflatedSize($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {
  // one Deflater + scratch buffer per executor thread, reset per row;
  // Deflater holds native zlib state, so per-row construction would
  // thrash JNI allocation on a corpus-wide scan
  private val deflaterLocal: ThreadLocal[Deflater] =
    ThreadLocal.withInitial(() =>
      new Deflater(Deflater.DEFAULT_COMPRESSION, /*nowrap=*/ true))
  private val bufLocal: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](8192))

  /** Shared by interpreted + generated code paths. */
  def deflatedSize(text: UTF8String): Int = {
    val d = deflaterLocal.get()
    d.reset()
    d.setInput(text.getBytes)
    d.finish()
    val buf = bufLocal.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Column↔Expression bridge (Spark 4 classic API via GraftColumnBridge). */
  def apply(c: Column): Column =
    GraftColumnBridge.column(DeflateSize(GraftColumnBridge.expression(c)))
}
