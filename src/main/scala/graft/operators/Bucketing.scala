package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location (SURVEY §1 "Keys / identity" and the
  * 100 TB posture): pre-hash-partition fact tables on their join key
  * at WRITE time so repeated joins/aggregations on that key run with
  * ZERO shuffle — the Spark replacement for the reference's DynamoDB
  * hash-key + GSIs access paths (__main__.py:37-45).
  *
  * At 100 TB this is the difference between shuffling the fact table
  * on every enrichment join (network-bound, re-done per query) and
  * paying the partitioning cost once at ingest: each of lineitem's
  * and orders' buckets with the same bucket id land on matching
  * splits, so SortMergeJoin reads both sides locally with no
  * Exchange. BucketingSpec asserts exactly that plan shape.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external parquet table. Buckets
    * must match across tables meant to co-join (same count, same key
    * semantics).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
    buckets: Int, path: String): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — with matching
    * bucket counts Catalyst plans a SortMergeJoin whose children are
    * bare bucketed scans (no Exchange on either side).
    */
  def cojoin(spark: SparkSession, left: String, right: String,
    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
