package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WordShingles

/** Property check: the codegen'd WordShingles expression must be
  * byte-identical to the HOF pipeline it replaced (the oracle SQL was
  * validated against the HOF formulation; any divergence would break
  * the shingle-based oracle queries silently).
  */
class WordShinglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The original interpreted formulation (pre-optimization). */
  private def hofShingles(text: org.apache.spark.sql.Column, n: Int) = {
    val arr = filter(split(text, " "), t => length(t) > 0)
    when(size(arr) >= n,
      transform(sequence(lit(0), size(arr) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(arr, i + lit(k + 1))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  test("codegen WordShingles == HOF formulation on generated corpora") {
    val word = Gen.oneOf("a", "bb", "ccc", "table", "row", "x1", "", " ")
    val text = Gen.listOf(word).map(_.mkString(" "))
    val samples = Gen.listOfN(300, text).sample.getOrElse(Nil) ++
      Seq("", " ", "  ", "one", "one two", "one two three",
        "a  b   c ", " lead trail ")
    for (n <- Seq(2, 3, 5)) {
      val rows = samples.toDF("text")
        .select(WordShingles($"text", n).as("cg"),
          hofShingles($"text", n).as("hof"))
        .collect()
      rows.zip(samples).foreach { case (r, s) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n text='$s'")
      }
    }
  }

  test("codegen path survives whole-stage codegen (no fallback)") {
    val df = Seq("a b c d e").toDF("text")
      .select(explode(WordShingles($"text", 3)).as("sh"))
    // "*(1)" marks a WholeStageCodegen stage in the plan string; an
    // interpreted fallback would print the bare operator tree
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"))
    assert(df.as[String].collect().toSeq == Seq("a b c", "b c d", "c d e"))
  }
}
