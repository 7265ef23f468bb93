package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.ExclusionPipeline

/** E1 lifecycle end-to-end on scrape-shaped fixtures carrying every
  * FIXTURES.md §2 edge case.
  */
class ExclusionPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  // (id, title, name, idx, value) — _parse_input_tag shape
  private val rawDetails = Seq(
    ("1", "BIS232Request.Product", null, 0, "steel pipe"),
    ("1", null, "JSONData.Grade", 1, "X42"),
    ("1", null, null, 3, "untitled-value"),       // → Untitled3
    ("1", "Empty", null, 4, ""),                  // dropped (empty)
    ("1", "__RequestVerificationToken", null, 5, "tok"), // dropped (noise)
    ("1", "Minimum Thickness", null, 6, "0.25"),
    ("2", "BIS232Request.Product", null, 0, "rebar"),
    ("2", "HTSUSCode", null, 1, "731815"),        // overwritten by summary
    ("9", "BIS232Objection.Org", null, 0, "ACME") // detail-only id
  ).toDF("id", "title", "name", "idx", "value")

  private val summaries = Seq(
    ("1", "CoA", "722230", "1E1771", ts(100), 0L),
    ("2", "CoB", "731816", "42", ts(100), 1L),
    // second scrape of id=2, later ts → must win LWW
    ("2", "CoB2", "731817", "4.20", ts(200), 2L)
  ).toDF("id", "Company", "HTSUSCode", "Payload", "scrape_ts", "scrape_pos")

  private lazy val out = ExclusionPipeline.run(spark, summaries, rawDetails,
    summaryCols = Seq("Company", "HTSUSCode", "Payload"),
    longCols = Seq("HTSUSCode"),
    doubleCols = Seq("Payload"))
    .orderBy("id").collect()

  test("one row per id, LWW keeps the later scrape") {
    assert(out.map(_.getString(0)).toSeq == Seq("1", "2", "9"))
    val r2 = out(1)
    assert(r2.getAs[String]("Company") == "CoB2")
    assert(r2.getAs[Long]("HTSUSCode") == 731817L)
  }

  test("summary overwrites detail on key collision (J1 semantics)") {
    val r2 = out(1)
    // detail said 731815, first summary 731816, final summary 731817
    assert(r2.getAs[Long]("HTSUSCode") == 731817L)
  }

  test("normalization: prefix strip + Untitled fallback + drops") {
    val f1 = out(0).getAs[Map[String, String]]("fields")
    assert(f1("Product") == "steel pipe")
    assert(f1("Grade") == "X42")
    assert(f1("Untitled3") == "untitled-value")
    assert(!f1.contains("Empty"))
    assert(!f1.contains("__RequestVerificationToken"))
    assert(f1("Minimum Thickness") == "0.25")
  }

  test("typify: guard blocks 1E1771, float leg converts 4.20") {
    assert(out(0).isNullAt(out(0).fieldIndex("Payload"))) // 1E1771 guarded
    assert(out(1).getAs[Double]("Payload") == 4.2)
  }

  test("detail-only ids survive the left merge") {
    val r9 = out(2)
    assert(r9.getAs[String]("Company") == null)
    assert(r9.getAs[Map[String, String]]("fields")("Org") == "ACME")
  }
}
