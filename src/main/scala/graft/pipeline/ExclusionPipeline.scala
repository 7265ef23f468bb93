package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Scalars

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

  /** Detail rows as scraped: one row per parsed `<input>` tag
    * (id, title, name, idx, value) — the _parse_input_tag shape
    * (clients/exclusion_requests.py:39-54).
    */
  def normalizeDetails(details: DataFrame): DataFrame =
    details
      .select(
        col("id"),
        Scalars.normalizeKey(
          Scalars.keyOrUntitled(col("title"), col("name"), col("idx"))).as("key"),
        trim(col("value").cast("string")).as("value"))
      // empty-value drop (:158) + verification-token de-noise (:161-164)
      .filter(length(col("value")) > 0 &&
        col("key") =!= "__RequestVerificationToken")

  /** Pivot normalized key/value detail rows into one document row per
    * id with an open-shape map column (SURVEY §1: fixed StructType up
    * front, dynamic tail in MapType).
    */
  def detailsToDocuments(normalized: DataFrame): DataFrame =
    normalized
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("key"), col("value"))))
        .as("fields"))

  /** Merge summaries over detail documents: the reference assigns
    * summary values AFTER parsing the page, so summary wins on key
    * collision (clients/exclusion_requests.py:97-99); detail-only ids
    * survive via the left join (J2).
    */
  def mergeSummaries(documents: DataFrame, summaries: DataFrame,
    summaryCols: Seq[String]): DataFrame = {
    val merged = documents.join(summaries, Seq("id"), "left_outer")
    val overlaid = summaryCols.foldLeft(merged) { (df, c) =>
      df.withColumn(c, coalesce(col(c), element_at(col("fields"), c)))
    }
    overlaid
  }

  /** Typify the numeric columns (F6, guarded cascade) and stamp the
    * load order for LWW.
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
