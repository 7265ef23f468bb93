package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DeflateSize
import graft.operators.TextOps

/** Properties of the deflate-size expression and the
  * compression-ratio quality signal (rows-only query — DuckDB has no
  * deflate, so these pins replace the oracle).
  */
class CompressSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = TestSpark.sf0001

  private def sz(s: String): Int =
    DeflateSize.deflatedSize(UTF8String.fromString(s))

  test("interpreted eval ≡ codegen over the fixture corpus") {
    val df = Tables(spark, dir, "documents")
    val viaPlan = df.select($"doc_id", DeflateSize($"text").as("d"))
      .as[(Long, Int)].collect().toMap
    val direct = df.select($"doc_id", $"text").as[(Long, String)]
      .collect().map { case (id, t) => id -> sz(t) }.toMap
    assert(viaPlan == direct)
  }

  test("repetition compresses far below diverse text; concatenation " +
    "is sub-additive; output is non-trivial") {
    val rep = ("spark " * 400).trim
    val div = (0 until 400).map(i => s"w${i}x${i * 7919 % 997}").mkString(" ")
    assert(sz(rep) > 0)
    assert(sz(rep) * 4 < sz(div), s"rep=${sz(rep)} div=${sz(div)}")
    // a self-concatenation adds almost no information
    assert(sz(div + " " + div) < 2 * sz(div))
    // determinism within the run (thread-local Deflater reset is clean)
    assert(sz(div) == sz(div))
  }

  test("q_compress_ratio: ratios in (0, 1.2]; the word-salad fixture " +
    "corpus compresses below 1 almost everywhere") {
    val out = TextOps.q_compress_ratio(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) > 0, s"doc ${r.getLong(0)} deflated to 0 bytes")
      val ratio = r.getDouble(3)
      assert(ratio > 0 && ratio <= 1.2, s"doc ${r.getLong(0)} ratio $ratio")
    }
    val below = out.count(_.getDouble(3) < 1.0)
    assert(below * 10 >= out.length * 9,
      s"only $below/${out.length} docs below ratio 1.0")
  }
}
