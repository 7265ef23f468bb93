package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML form-input parsing (SURVEY §2.1 S2) as pure Column
  * expressions — the reference's core transform: a detail page's
  * `<input>`/`<textarea>` tags → key/value pairs
  * (/root/reference/clients/exclusion_requests.py:39-54,153-165).
  *
  * Faithfully reproduced semantics:
  *  - scope: the FIRST `<form>` element (`soup.form`, :154);
  *  - tag order: all inputs (enumerated 0..n-1), then all textareas
  *    (enumerated 0..m-1 again — each list has its own index, :156-157);
  *  - key: `title` attr, else `name` attr (empty counts as absent —
  *    Python's `if not key`), else `"Untitled"+idx` (:40-44), then the
  *    four scrape markers removed anywhere in the key (:45-48);
  *    keys are NOT trimmed (the reference never strips keys);
  *  - value: the `value` attribute for inputs / the inner text for
  *    textareas, `str(value).strip()` (:49-53). Python quirk kept
  *    bug-compatible: a MISSING value attr (or empty textarea body)
  *    is `str(None)` = the literal string "None", which survives the
  *    downstream non-empty filter exactly like the reference.
  *
  * Documented approximation vs BeautifulSoup: attributes are parsed
  * with regex (both quote styles, case-insensitive) and only the five
  * standard HTML entities are decoded — correct for the portal's
  * machine-generated ASP.NET markup this grammar targets, not for
  * arbitrary hand-written HTML.
  */
object HtmlInputs {

  private val markers = Scalars.markerPattern

  /** Python str.strip() strips ALL whitespace (\t\n\r\f etc.), not
    * just spaces like Spark's trim() — a multi-line textarea body
    * must strip its newline edges exactly like the reference.
    */
  private def pyStrip(c: Column): Column =
    regexp_replace(c, "^\\s+|\\s+$", "")

  private def unescape(c: Column): Column =
    Seq("&quot;" -> "\"", "&#39;" -> "'", "&lt;" -> "<", "&gt;" -> ">",
      "&amp;" -> "&")
      .foldLeft(c) { case (acc, (ent, ch)) => regexp_replace(acc, ent, ch) }

  /** Attribute value, or null when the attribute is absent (an
    * attribute preceded by whitespace, either quote style).
    * Known approximation beyond the quote/entity notes above: the
    * regex scans the whole tag, so an attr-shaped sequence INSIDE
    * another attribute's quoted value (e.g. title="my name=x" making
    * `name=` resolve from the title text) would match. ASP.NET's
    * generated markup never nests attr-shaped text in values; parsing
    * hand-written HTML would need a quote-span-aware scanner here.
    */
  private def attrVal(tag: Column, name: String): Column =
    coalesce(
      when(tag.rlike(s"""(?i)\\s$name\\s*=\\s*""""),
        regexp_extract(tag, s"""(?i)\\s$name\\s*=\\s*"([^"]*)"""", 1)),
      when(tag.rlike(s"(?i)\\s$name\\s*=\\s*'"),
        regexp_extract(tag, s"(?i)\\s$name\\s*=\\s*'([^']*)'", 1)))

  /** title → name → Untitled<idx>, markers stripped
    * (_parse_input_tag, :40-48).
    */
  private def keyOf(tag: Column, idx: Column): Column = {
    val t = attrVal(tag, "title")
    val n = attrVal(tag, "name")
    val raw = when(length(t) > 0, t)
      .when(length(n) > 0, n)
      .otherwise(concat(lit("Untitled"), idx.cast("string")))
    regexp_replace(unescape(raw), markers, "")
  }

  private def inputValue(tag: Column): Column = {
    val v = attrVal(tag, "value")
    when(v.isNotNull, pyStrip(unescape(v))).otherwise(lit("None"))
  }

  private def textareaValue(tag: Column): Column = {
    val inner = regexp_extract(tag,
      "(?is)^<textarea[^>]*>([\\s\\S]*?)</textarea>$", 1)
    // empty body ⇒ BeautifulSoup .string is None ⇒ str(None)
    when(length(inner) > 0, pyStrip(unescape(inner))).otherwise(lit("None"))
  }

  /** Page HTML → array<struct<key,value>> of parsed pairs in the
    * reference's order (inputs then textareas), ready for posexplode.
    * This is the Generator/UDTF shape of SURVEY §2.9 tier 4,
    * expressed with built-in higher-order functions — a parse-stage
    * transform off the hot aggregate path, so the CodegenFallback
    * cost of transform() is acceptable.
    */
  /** The one form-extraction pattern (FIRST full <form>…</form>) —
    * shared by [[pageInputPairs]] and the pipeline's URL-row gate so
    * the two can never diverge on what counts as a parseable form.
    */
  val formPattern = "(?is)<form[\\s\\S]*?</form>"

  def pageInputPairs(page: Column): Column = {
    val form = regexp_extract(page, formPattern, 0)
    val inputs = regexp_extract_all(form, lit("(?i)<input[^>]*>"), lit(0))
    val tas = regexp_extract_all(form,
      lit("(?is)<textarea[^>]*>[\\s\\S]*?</textarea>"), lit(0))
    val ip = transform(inputs, (tag, i) =>
      struct(keyOf(tag, i).as("key"), inputValue(tag).as("value")))
    val tp = transform(tas, (tag, i) =>
      struct(keyOf(tag, i).as("key"), textareaValue(tag).as("value")))
    concat(ip, tp)
  }
}
