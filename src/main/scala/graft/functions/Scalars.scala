package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar layer reproducing the reference's per-value transforms as
  * pure `Column` expressions (Catalyst-optimizable, codegen'd — no
  * UDFs, SURVEY §2.9 policy).
  *
  * Reference semantics (file:line cites are into /root/reference):
  *  - typify cascade: trial int() → float() → keep string
  *    (clients/dynamodb.py:51-63), guarded so values containing
  *    inf/nan/e are never numified (clients/dynamodb.py:53-54 — the
  *    "1E1771" guard).
  *  - key normalization: prefix strip + trim
  *    (clients/exclusion_requests.py:39-54).
  */
object Scalars {

  /** inf/nan/e numeric guard (clients/dynamodb.py:53-54). */
  def numifiable(c: Column): Column = {
    val s = lower(trim(c.cast("string")))
    !(s.contains("inf") || s.contains("nan") || s.contains("e"))
  }

  // int() accepts optional sign + digits; capped at 18 digits so the
  // guarded plain cast can never overflow a LongType (values longer
  // than 18 digits fall through to the double leg, mirroring Python's
  // arbitrary-precision int only approximately — documented drift).
  private val longRe = "^[+-]?[0-9]{1,18}$"
  // float() without exponent forms — exponent is excluded by the
  // guard anyway (clients/dynamodb.py:54).
  private val doubleRe = "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)$"

  /** int() leg of the cascade (clients/dynamodb.py:55-57): null when
    * the value is not an integer literal. Guarded regex + plain cast
    * keeps this safe under ANSI mode (never throws).
    */
  def typifyLong(c: Column): Column = {
    val s = trim(c.cast("string"))
    when(numifiable(c) && s.rlike(longRe), s.cast("long"))
  }

  /** float() leg (clients/dynamodb.py:59-61), reached only when the
    * int leg failed.
    */
  def typifyDouble(c: Column): Column = {
    val s = trim(c.cast("string"))
    when(numifiable(c) && !s.rlike(longRe) && s.rlike(doubleRe), s.cast("double"))
  }

  /** Whole cascade as one numeric column (long leg widened to double);
    * null ⇒ "stays a string" in the reference's document model.
    */
  def typifyNumber(c: Column): Column =
    coalesce(typifyLong(c).cast("double"), typifyDouble(c))

  /** Key normalization: strip the four scrape markers
    * (clients/exclusion_requests.py:45-48) then trim (:53). The
    * reference uses str.replace, which removes EVERY occurrence
    * anywhere in the key (e.g. "JSONData.BIS232Request.Foo" → "Foo"),
    * so the pattern is deliberately unanchored and regexp_replace's
    * replace-all matches it. Remaining (documented) drift: Python
    * applies the four replaces sequentially, so a removal can create
    * a new match that a single left-to-right regex pass won't rescan
    * — unreachable for real scraped keys.
    */
  /** The four scrape markers (single source of truth — HtmlInputs'
    * tag parser strips the same set, without the trim).
    */
  val markerPattern: String =
    "(BIS232Request\\.|JSONData\\.|BIS232Objection\\.|BIS232ObjectionRebuttal)"

  def normalizeKey(c: Column): Column =
    trim(regexp_replace(c, markerPattern, ""))

  /** Fallback key naming: title, else name, else "Untitled<idx>"
    * (clients/exclusion_requests.py:40-44).
    */
  def keyOrUntitled(title: Column, name: Column, idx: Column): Column =
    coalesce(nullIfEmpty(title), nullIfEmpty(name),
      concat(lit("Untitled"), idx.cast("string")))

  /** Empty string → null (the reference's empty-value drop,
    * clients/exclusion_requests.py:158, as a reusable building block).
    */
  def nullIfEmpty(c: Column): Column = when(length(trim(c)) > 0, trim(c))

  /** Python `str(value).strip()` (clients/exclusion_requests.py:53):
    * None stringifies to 'None' (which then SURVIVES the non-empty
    * filter — the reference's famous quirk), and strip removes ALL
    * whitespace, not just spaces (Spark's trim() is space-only).
    */
  def pyStr(c: Column): Column =
    regexp_replace(coalesce(c.cast("string"), lit("None")),
      "^\\s+|\\s+$", "")
}
