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

  // ── S2: raw page HTML → key/value rows (_read_page_inputs) ─────────

  private val pageHtml =
    """<html><body><div>outside form: <input title="Ignored" value="x"/></div>
      |<form method="post" action="/Forms/ExclusionRequestItem/1">
      |  <input type="text" title="BIS232Request.Product" value="steel pipe"/>
      |  <input name="JSONData.Grade" value="X42"/>
      |  <input type="hidden" value="untitled-value"/>
      |  <input title="Empty" value=""/>
      |  <input name="__RequestVerificationToken" value="tok123"/>
      |  <input title="Dup" value="first"/>
      |  <input title="Dup" value="second"/>
      |  <input title="NoValueAttr" type="checkbox"/>
      |  <input title='Single &amp; Quoted' value='a &lt;b&gt;'/>
      |  <textarea name="BIS232Objection.Comments">  some comment  </textarea>
      |  <textarea name="EmptyArea"></textarea>
      |  <textarea name="BlankArea">   </textarea>
      |  <textarea name="MultiLine">
      |    spans lines
      |  </textarea>
      |  <textarea name="NewlineOnly">
      |</textarea>
      |</form>
      |<form><input title="SecondForm" value="nope"/></form>
      |</body></html>""".stripMargin

  private lazy val parsed = {
    val pages = Seq(("1", pageHtml, "https://example.test/Forms/ExclusionRequestItem/1"))
      .toDF("id", "page", "url")
    ExclusionPipeline.parsePages(pages).collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
  }

  test("parsePages: only the first form is parsed; keys fall back title→name→Untitled") {
    assert(parsed("Product") == "steel pipe")      // title + marker strip
    assert(parsed("Grade") == "X42")               // name + marker strip
    assert(parsed("Untitled2") == "untitled-value") // no title/name, input idx 2
    assert(!parsed.contains("Ignored"))            // outside the form
    assert(!parsed.contains("SecondForm"))         // soup.form = FIRST form only
  }

  test("parsePages: empty values and the verification token are dropped") {
    assert(!parsed.contains("Empty"))
    assert(!parsed.contains("__RequestVerificationToken"))
    assert(!parsed.contains("BlankArea"))          // whitespace-only → stripped → dropped
  }

  test("parsePages: duplicate keys keep the LAST occurrence (dict build)") {
    assert(parsed("Dup") == "second")
  }

  test("parsePages: textarea inner text is the value, stripped like str.strip()") {
    assert(parsed("Comments") == "some comment")
    // Python strip removes newline/indent edges, not just spaces
    assert(parsed("MultiLine") == "spans lines")
    // a newline-only body strips to "" and is dropped (reference :158)
    assert(!parsed.contains("NewlineOnly"))
  }

  test("parsePages: pages without a form produce no rows (not even URL)") {
    val pages = Seq(
      ("7", "<html><body>Error 500</body></html>", "u7"),
      ("8", null.asInstanceOf[String], "u8"))
      .toDF("id", "page", "url")
    assert(ExclusionPipeline.parsePages(pages).count() == 0)
  }

  test("parsePages: missing value attr / empty textarea is str(None), like the reference") {
    assert(parsed("NoValueAttr") == "None")
    assert(parsed("EmptyArea") == "None")
  }

  test("parsePages: entities decode in keys and values; URL entry is added") {
    assert(parsed("Single & Quoted") == "a <b>")
    assert(parsed("URL") == "https://example.test/Forms/ExclusionRequestItem/1")
  }

  test("parsePages feeds detailsToDocuments end-to-end") {
    val pages = Seq(("1", pageHtml, "u1")).toDF("id", "page", "url")
    val docs = ExclusionPipeline.detailsToDocuments(
      ExclusionPipeline.parsePages(pages)).collect()
    assert(docs.length == 1)
    val fields = docs(0).getAs[Map[String, String]]("fields")
    assert(fields("Product") == "steel pipe" && fields("URL") == "u1")
  }
}
