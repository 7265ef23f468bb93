package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline building blocks (SURVEY §2.11) as pure Column
  * expressions — whole-stage-codegen friendly, no UDFs. Tokenization
  * inherits the reference's empty-value drop rule
  * (/root/reference/clients/exclusion_requests.py:158): splitting on
  * single spaces yields empty tokens on runs/trailing spaces, which
  * are filtered, exactly like the reference drops empty scraped
  * values.
  */
object TextFns {

  /** Non-empty whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles, space-joined; empty array when the doc has
    * fewer than n tokens. Backed by the codegen'd [[WordShingles]]
    * expression (the equivalent HOF pipeline —
    * transform(sequence(...)) over element_at — is CodegenFallback
    * and dominated shingle-heavy queries when interpreted).
    */
  def shingles(text: Column, n: Int): Column = WordShingles(text, n)

  /** Exact-content fingerprint: lowercase + whitespace-collapse + md5. */
  def fingerprintExact(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Order-invariant bag-of-words fingerprint (sorted distinct token
    * set). Robust to token shuffling — the "shape" of the document.
    */
  def fingerprintShape(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** MinHash leg j: min over shingles of md5("<j>:<shingle>").
    * String-min over lowercase hex is a total order identical in
    * Spark and DuckDB (ASCII binary collation both sides).
    */
  def minhashLeg(shingle: Column, seed: Int): Column =
    min(md5(concat(lit(s"$seed:"), shingle)))

  /** One 32-bit half of a 64-bit token hash for SimHash: hex chars
    * 1–8 (hi) / 9–16 (lo) of md5, as a non-negative long. The 64-bit
    * hash is kept in two 32-bit halves on BOTH engines: a single
    * 64-bit assembly would need bit 63, and a BIGINT with the sign
    * bit set is exactly the literal neither engine's ANSI overflow
    * rules handle portably.
    */
  def tokenHashHalf(tok: Column, hi: Boolean): Column =
    conv(substring(md5(tok), if (hi) 1 else 9, 8), 16, 10).cast("long")

  /** Bit b of a hash word as ±1 (SimHash vote). */
  def simhashVote(h: Column, b: Int): Column =
    when(shiftright(h, b).bitwiseAND(lit(1)) === 1, lit(1)).otherwise(lit(-1))
}
