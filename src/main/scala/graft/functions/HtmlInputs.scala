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


  /** Python str.strip() strips ALL whitespace (\t\n\r\f etc.), not
    * just spaces like Spark's trim() — a multi-line textarea body
    * must strip its newline edges exactly like the reference.
    * btrim with Java regex \s's exact character set [ \t\n\x0B\f\r]:
    * a literal set-trim, not a per-row regex (this parser runs per
    * TAG over the whole corpus — the r5 sf1.0 bench put q_html_inputs
    * at the top of the cost table, and regex execs are its cost).
    */
  private def pyStrip(c: Column): Column =
    btrim(c, lit(" \t\n\u000B\f\r"))

  /** Entity decode via literal `replace` (StringReplace is codegen'd
    * byte scanning; the entities are fixed strings, a regex engine
    * per row bought nothing — same swap commit 11eb953 made for
    * q_json_extract).
    */
  private def unescape(c: Column): Column =
    Seq("&quot;" -> "\"", "&#39;" -> "'", "&lt;" -> "<", "&gt;" -> ">",
      "&amp;" -> "&")
      .foldLeft(c) { case (acc, (ent, ch)) =>
        replace(acc, lit(ent), lit(ch)) }

  /** Attribute value, or null when the attribute is absent (an
    * attribute preceded by whitespace, either quote style). ONE
    * regexp_extract per attribute: the quoted token (either style) is
    * captured whole, presence is its non-emptiness (an attr with an
    * EMPTY value still captures its two quote chars), and the quotes
    * are stripped with substr — the previous shape paid up to four
    * regex executions (rlike+extract per quote style) per attribute
    * per tag.
    * Known approximation beyond the quote/entity notes above: the
    * regex scans the whole tag, so an attr-shaped sequence INSIDE
    * another attribute's quoted value (e.g. title="my name=x" making
    * `name=` resolve from the title text) would match; and the FIRST
    * occurrence wins regardless of quote style (the old form
    * preferred a double-quoted match anywhere over a single-quoted
    * one — indistinguishable unless one tag repeats an attribute in
    * both styles). ASP.NET's generated markup does neither; parsing
    * hand-written HTML would need a quote-span-aware scanner here.
    */
  private def attrVal(tag: Column, name: String): Column = {
    val m = regexp_extract(tag,
      s"""(?i)\\s$name\\s*=\\s*("[^"]*"|'[^']*')""", 1)
    when(length(m) > 0, m.substr(lit(2), length(m) - 2))
  }

  /** title → name → Untitled<idx>, markers stripped
    * (_parse_input_tag, :40-48). private[graft]: the pipeline's
    * exploded-row parse path applies these as TOP-LEVEL projections
    * (codegen'd) instead of inside a transform() lambda (interpreted)
    * — same expressions, ~2× the throughput at sf1.0.
    */
  private[graft] def keyOf(tag: Column, idx: Column): Column = {
    val t = attrVal(tag, "title")
    val n = attrVal(tag, "name")
    val raw = when(length(t) > 0, t)
      .when(length(n) > 0, n)
      .otherwise(concat(lit("Untitled"), idx.cast("string")))
    Scalars.stripMarkers(unescape(raw))
  }

  private[graft] def inputValue(tag: Column): Column = {
    val v = attrVal(tag, "value")
    when(v.isNotNull, pyStrip(unescape(v))).otherwise(lit("None"))
  }

  private[graft] def textareaValue(tag: Column): Column = {
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
  /** FIRST full `<form>…</form>` span, or '' when the page has none —
    * shared by [[pageInputPairs]] and the pipeline's URL-row gate so
    * the two can never diverge on what counts as a parseable form.
    * Implemented as case-folded `instr` + `substr` (codegen'd linear
    * byte search), NOT the previous `(?is)<form[\\s\\S]*?</form>`
    * regex: the reluctant scan cost ~36 µs/page and was the single
    * most expensive primitive in the r5 sf1.0 stage timing (1.8 s of
    * q_html_inputs' 7.4 s). Identical result: the regex also matched
    * the first literal "<form" and the shortest span to the next
    * "</form>".
    */
  private[graft] def firstForm(page: Column): Column = {
    val low = lower(page)
    val open = instr(low, "<form")
    // close is searched FROM the open position (via a relative
    // substring) — the regex's semantics were "nearest </form> AFTER
    // the first <form", not "first </form> anywhere"
    val closeRel = instr(low.substr(open, length(low)), "</form>")
    when(open > 0 && closeRel > 0,
      page.substr(open, closeRel + lit(6))).otherwise(lit(""))
  }

  /** Raw `<input>` tags of the first form, in document order. */
  private[graft] def inputTags(form: Column): Column =
    regexp_extract_all(form, lit("(?i)<input[^>]*>"), lit(0))

  /** Raw `<textarea>…</textarea>` tags of the first form, in order. */
  private[graft] def textareaTags(form: Column): Column =
    regexp_extract_all(form,
      lit("(?is)<textarea[^>]*>[\\s\\S]*?</textarea>"), lit(0))

  def pageInputPairs(page: Column): Column = {
    val form = firstForm(page)
    val ip = transform(inputTags(form), (tag, i) =>
      struct(keyOf(tag, i).as("key"), inputValue(tag).as("value")))
    val tp = transform(textareaTags(form), (tag, i) =>
      struct(keyOf(tag, i).as("key"), textareaValue(tag).as("value")))
    concat(ip, tp)
  }
}
