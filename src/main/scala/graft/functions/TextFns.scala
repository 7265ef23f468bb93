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

  /** 16-bit token hash for SimHash: first 4 hex chars of md5 → int. */
  def tokenHash16(tok: Column): Column =
    conv(substring(md5(tok), 1, 4), 16, 10).cast("int")

  /** Bit b of a 16-bit hash as ±1 (SimHash vote). */
  def simhashVote(h16: Column, b: Int): Column =
    when(shiftright(h16, b).bitwiseAND(lit(1)) === 1, lit(1)).otherwise(lit(-1))
}
