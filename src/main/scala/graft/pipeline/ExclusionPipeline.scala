package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{HtmlInputs, Scalars}

/** The reference's three entry-point pipelines (SURVEY §3, E1–E3) as
  * one declarative DataFrame program: what took the reference a
  * serialized scrape loop + per-record Python transforms
  * (/root/reference/__main__.py:36-121) becomes
  *
  *   summaries (S1 source) ⋈ details (S2 key/value rows)
  *     → normalize keys (F1–F3) → drop noise (P3/P4)
  *     → pivot to document → summary-overwrites-detail merge (J1)
  *     → typify (F6) → LWW dedup by id (W1/S6) → sink-ready table
  *
  * Thread/node boundaries appear only at the joins/aggregations; the
  * reference's 81-code sequential fetch is replaced by partitioned
  * parallel reads of the source (see graft.sources.datatables).
  */
object ExclusionPipeline {

  /** Raw detail PAGES → normalized (id, key, value) rows: the
    * _read_page_inputs transform (clients/exclusion_requests.py:153-165)
    * end-to-end on page HTML. Input: one row per fetched page with
    * (idCol, pageCol = HTML text, urlCol). Per page:
    *   parse input/textarea tags → (key, value) pairs
    *     (HtmlInputs.pageInputPairs, :156-157)
    *   → drop empty values (:158)
    *   → dict build: the LAST occurrence of a key wins (:159)
    *   → add the URL entry (:160, overwriting any scraped 'URL' key
    *     like dict assignment does)
    *   → drop __RequestVerificationToken (:161-164).
    * Pages with no `<form>` (error pages, null bodies) produce NO
    * rows — deliberate deviation from the reference, which raises
    * AttributeError on `soup.form.find_all` and kills the whole run;
    * an engine drops the unparseable page instead of fabricating a
    * URL-only document for it.
    * Output feeds [[detailsToDocuments]]. Fully distributed: parsing
    * is per-row expressions; the only shuffle is the per-(id,key)
    * last-wins window.
    */
  def parsePages(pages: DataFrame, idCol: String = "id",
    pageCol: String = "page", urlCol: String = "url"): DataFrame = {
    // ONE scan, raw tags exploded, parse as top-level projections:
    // the form span and both tag arrays are computed once per page
    // (firstForm is an instr/substr scan, not a reluctant regex), and
    // keyOf/value run codegen'd on the exploded tag rows instead of
    // inside a transform() lambda (interpreted CodegenFallback) —
    // r5 stage timing: the old shape spent 1.8 s/pass on the form
    // regex and 2.4 s on the interpreted per-tag parse at sf1.0.
    // Semantics identical: `ord` is the global inputs-then-textareas
    // position (what posexplode over the concatenated pair array
    // produced) while each list keeps its OWN 0-based index for the
    // Untitled<idx> key fallback.
    val tagged = pages
      .select(col(idCol).as("id"), col(urlCol).as("url"),
        size(HtmlInputs.inputTags(HtmlInputs.firstForm(col(pageCol))))
          .as("__n_inputs"),
        posexplode(concat(
          HtmlInputs.inputTags(HtmlInputs.firstForm(col(pageCol))),
          HtmlInputs.textareaTags(HtmlInputs.firstForm(col(pageCol))))))
    val isInput = col("pos") < col("__n_inputs")
    val listIdx = when(isInput, col("pos"))
      .otherwise(col("pos") - col("__n_inputs"))
    val pairs = tagged
      .select(col("id"), col("url"), col("pos").as("ord"),
        HtmlInputs.keyOf(col("col"), listIdx).as("key"),
        when(isInput, HtmlInputs.inputValue(col("col")))
          .otherwise(HtmlInputs.textareaValue(col("col"))).as("value"))
      .filter(length(col("value")) > 0)
    // last-wins as a partial-combining aggregate, not a window: ord is
    // the page-global tag position — UNIQUE within (id, key) — so
    // max_by(value, ord) picks exactly the row the old
    // row_number()-over-(ord DESC) window kept, deterministically,
    // while aggregating map-side before the exchange (the lpVote
    // struct-argmax discipline) instead of sorting every (id, key)
    // partition after it
    val deduped = pairs
      .groupBy("id", "key")
      .agg(max_by(col("value"), col("ord")).as("value"))
      .filter(col("key") =!= "__RequestVerificationToken" &&
        col("key") =!= "URL")
    // URL rows gate on the SAME extraction the pair parse uses (a full
    // <form>…</form> span) — an rlike("<form") here would fabricate a
    // URL-only row for a page whose truncated/unclosed form yields no
    // pairs, contradicting "no parseable form ⇒ NO rows"
    val urlRows = pages
      .filter(length(HtmlInputs.firstForm(col(pageCol))) > 0)
      .select(col(idCol).as("id"), lit("URL").as("key"),
        col(urlCol).as("value"))
    deduped.unionByName(urlRows)
  }

  /** Detail rows as scraped: one row per parsed `<input>` tag
    * (id, title, name, idx, value) — the _parse_input_tag shape
    * (clients/exclusion_requests.py:39-54), with the reference's EXACT
    * semantics (matching the parsePages/HtmlInputs path):
    *  - key: title → name → Untitled<idx> with Python truthiness ("" is
    *    falsy, " " is truthy) and NO trim — the reference never strips
    *    keys (:40-48); markers removed anywhere (:45-48);
    *  - value: str(value).strip() — str(None) = 'None' survives the
    *    non-empty filter (:53,158), strip removes all whitespace;
    *  - `ord` (the tag index) rides along so the dict-build
    *    last-occurrence-wins (:159) stays decidable downstream.
    */
  def normalizeDetails(details: DataFrame): DataFrame =
    details
      .select(
        col("id"),
        Scalars.stripMarkers(
          when(length(col("title")) > 0, col("title"))
            .when(length(col("name")) > 0, col("name"))
            .otherwise(concat(lit("Untitled"), col("idx").cast("string"))))
          .as("key"),
        Scalars.pyStr(col("value")).as("value"),
        col("idx").as("ord"))
      // empty-value drop (:158) + verification-token de-noise (:161-164)
      .filter(length(col("value")) > 0 &&
        col("key") =!= "__RequestVerificationToken")

  /** Pivot normalized key/value detail rows into one document row per
    * id with an open-shape map column (SURVEY §1: fixed StructType up
    * front, dynamic tail in MapType). Duplicate keys are resolved
    * LAST-occurrence-wins by `ord` BEFORE the map build — the
    * reference's dict assignment (:159), and a hard requirement here:
    * map_from_entries THROWS on duplicate keys under Spark's default
    * mapKeyDedupPolicy=EXCEPTION, and collect_list order after a
    * shuffle would make any other resolution nondeterministic.
    * (Input without an `ord` column — e.g. parsePages output, already
    * per-(id,key) deduped — gets a constant ord.)
    */
  def detailsToDocuments(normalized: DataFrame): DataFrame = {
    val withOrd =
      if (normalized.columns.contains("ord")) normalized
      else normalized.withColumn("ord", lit(0L))
    val lastWins = Window.partitionBy("id", "key").orderBy(col("ord").desc)
    withOrd
      .withColumn("__rn", row_number().over(lastWins))
      .filter(col("__rn") === 1)
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("key"), col("value"))))
        .as("fields"))
  }

  /** Merge summaries over detail documents: the reference assigns
    * summary values AFTER parsing the page, so summary wins on key
    * collision UNCONDITIONALLY — `all_values[col] = value` even when
    * the summary value is None (clients/exclusion_requests.py:97-99).
    * A bare coalesce cannot express that (it would resurrect a stale
    * scraped value under an explicitly-null summary field), so a
    * presence marker distinguishes 'id absent from summaries' (detail
    * value survives, J2) from 'summary value is null' (null wins).
    */
  def mergeSummaries(documents: DataFrame, summaries: DataFrame,
    summaryCols: Seq[String]): DataFrame = {
    val marked = summaries.withColumn("__has_summary", lit(true))
    val merged = documents.join(marked, Seq("id"), "left_outer")
    val overlaid = summaryCols.foldLeft(merged) { (df, c) =>
      df.withColumn(c,
        when(col("__has_summary"), col(c))
          .otherwise(element_at(col("fields"), c)))
    }
    overlaid.drop("__has_summary")
  }

  /** Typify the numeric columns (F6, guarded cascade) and stamp the
    * load order for LWW. Documented deviation from the reference: a
    * non-conforming value (guard-blocked, or float-shaped in a
    * longCol) becomes a typed NULL here, where the reference's
    * untyped dict keeps the raw string (dynamodb.py:51-63) — a typed
    * engine cannot hold both in one column. The raw string is not
    * lost: detail-sourced keys keep it in the `fields` map, and the
    * long/double column split itself is caller configuration the
    * reference doesn't have (its cascade is per-value).
    */
  def typifyColumns(df: DataFrame, longCols: Seq[String],
    doubleCols: Seq[String]): DataFrame = {
    val l = longCols.foldLeft(df)((d, c) =>
      d.withColumn(c, Scalars.typifyLong(col(c))))
    doubleCols.foldLeft(l)((d, c) =>
      d.withColumn(c, Scalars.typifyNumber(col(c))))
  }

  /** Last-write-wins upsert semantics of the DynamoDB PUT sink
    * (__main__.py:11-23): of N versions of an id, the latest
    * `scrape_ts` (tie-break: highest batch position) survives.
    */
  def lwwByKey(df: DataFrame, key: String, ts: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts.desc, tieBreak.desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Declared S2 query: synthesize a detail page per document row
    * (HTML-safe fixture text), run the real input-tag parser over it,
    * and emit the parsed (doc_id, key, value) rows. The oracle
    * derives the expected pairs straight from the base columns, so
    * the driver hash-checks the whole parse path: title/name/Untitled
    * key fallback, marker strip, empty-value drop, token drop,
    * str(None) quirk, textarea trim, and the URL entry.
    */
  def q_html_inputs(spark: SparkSession, dir: String): DataFrame = {
    val page = concat(
      lit("<html><body><form action=\"/f\" method=\"post\">"),
      lit("<input title=\"BIS232Request.Lang\" value=\""), col("lang"), lit("\"/>"),
      lit("<input name=\"JSONData.Source\" value=\""), col("source"), lit("\"/>"),
      lit("<input type=\"hidden\" value=\"h\"/>"),
      lit("<input title=\"Empty\" value=\"\"/>"),
      lit("<input name=\"__RequestVerificationToken\" value=\"tok\"/>"),
      lit("<input title=\"NoVal\"/>"),
      lit("<textarea name=\"Head\">"), substring(col("text"), 1, 30), lit("</textarea>"),
      lit("</form></body></html>"))
    val pages = graft.Tables(spark, dir, "documents")
      .select(col("doc_id").cast("string").as("id"), page.as("page"),
        concat(lit("https://portal/Forms/Item/"), col("doc_id")).as("url"))
    // No cache (r11): the r5 cache existed because the global ORDER
    // BY's range-bounds sampling re-executed the parse chain. Under
    // AQE the sort is a separate query stage whose sampling reads the
    // MATERIALIZED shuffle of the dedup stage inside parsePages, not
    // the raw parse — only the cheap URL branch (one firstForm scan)
    // re-runs. Dropping the cache removes a full per-pass
    // materialization (measured: 3.2–4.6 s cached-cold → ~1.3 s
    // uncached under the cold-pass protocol, value-identical).
    parsePages(pages)
      .select(col("id").cast("long").as("doc_id"), col("key"), col("value"))
      .orderBy("doc_id", "key")
  }

  /** End-to-end E1: summaries source + raw detail rows → load-ready
    * exclusion-request table.
    */
  def run(spark: SparkSession, summaries: DataFrame, rawDetails: DataFrame,
    summaryCols: Seq[String], longCols: Seq[String],
    doubleCols: Seq[String]): DataFrame = {
    val docs = detailsToDocuments(normalizeDetails(rawDetails))
    val merged = mergeSummaries(docs, summaries, summaryCols)
    val typed = typifyColumns(merged, longCols, doubleCols)
    lwwByKey(typed, "id", col("scrape_ts"), col("scrape_pos"))
  }
}
