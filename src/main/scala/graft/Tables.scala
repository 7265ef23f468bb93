package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver-generated star schema
  * (TESTDATA.md). One parquet file per table under `$dir/`.
  *
  * Scale posture: `spark.read.parquet` gives us the vectorized
  * columnar reader, predicate pushdown and column pruning for free;
  * at cluster scale the same call pattern works over a partitioned
  * directory tree — nothing here assumes single-file layout.
  *
  * Timestamp normalization — the driver's fixtures have shipped two
  * different parquet annotations across rounds, and this loader maps
  * BOTH to the same µs TimestampType so the query surface never sees
  * the difference:
  *  - TIMESTAMP(NANOS) (rounds ≤ 4): Spark has no native ns type
  *    (PARQUET_TYPE_ILLEGAL without the legacy conf). Sessions set
  *    `spark.sql.legacy.parquet.nanosAsLong=true` (graft.Verify /
  *    graft.Bench / specs do); the loader truncates the ns long → µs
  *    TimestampType, exactly matching DuckDB's ns → µs truncation
  *    (SURVEY §2.12 rule 5 / FIXTURES.md §1).
  *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) (round-5 regeneration):
  *    Spark reads TIMESTAMP_NTZ, which Spark 4 refuses to cast to
  *    numeric (the RANGE-frame and epoch-arithmetic queries analyze
  *    with DATATYPE_MISMATCH). Every session here runs in UTC
  *    (SURVEY §2.12 rule 4), so NTZ → TimestampType is a pure
  *    re-annotation: identical micros-since-epoch, identical wall
  *    clock, and DuckDB (whose TIMESTAMP is itself naive) computes
  *    on the very same values.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Resolved-plan memo, one entry per (session, dir, table). A bare
    * `spark.read.parquet` pays driver-side footer reads (schema
    * inference) and file listing on EVERY call — across a bench pass
    * that is hundreds of redundant driver round-trips for ten static
    * tables (guide §5: the driver should do almost no data work, and
    * §6: listing/inference is driver-side, single-process). The memo
    * reuses the resolved LogicalRelation — a PLAN, never data or
    * results: every action still scans the parquet. Keyed by session
    * (a `newSession()` re-resolves — its confs may differ); entries
    * evict when the owning context ends (the GraphOps substrate-memo
    * discipline).
    *
    * STATIC-TABLES ASSUMPTION (ADVICE r10): the memo pins the file
    * listing and inferred schema at first read, so a table directory
    * that changes mid-session goes unseen until [[invalidate]] is
    * called (or the context ends). The driver's fixtures are
    * immutable per run, which is the deployment shape this loader
    * declares; a pipeline over mutating directories must call
    * [[invalidate]] after each external write — the moral equivalent
    * of `REFRESH TABLE`. Sessions are held strongly until context
    * end: bounded for the driver's one-session-per-JVM mains, and
    * `newSession()`-churning tests share one context whose end sweeps
    * everything.
    */
  private val planMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  /** Drop memoized plans (all, or one dir's) so the next [[apply]]
    * re-lists and re-infers — the explicit refresh path for anything
    * that rewrites a fixture directory in place.
    */
  def invalidate(dir: Option[String] = None): Unit = dir match {
    case Some(d) => planMemo.keySet.removeIf(_._2 == d)
    case None    => planMemo.clear()
  }

  private val evictionHook = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.SparkContext, Unit]()

  private def registerEviction(sc: org.apache.spark.SparkContext): Unit =
    evictionHook.computeIfAbsent(sc, { _ =>
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
          e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          planMemo.keySet.removeIf(_._1.sparkContext eq sc)
          evictionHook.remove(sc)
          sc.removeSparkListener(this)
        }
      })
      ()
    })

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    registerEviction(spark.sparkContext)
    planMemo.computeIfAbsent((spark, dir, name), { _ => load(spark, dir, name) })
  }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case LongType if f.name == "ts" =>
          // ns-since-epoch long → µs TimestampType (floor division ≡
          // DuckDB truncation; ts values are post-1970, floor = trunc)
          acc.withColumn(f.name, timestamp_micros(expr(s"${f.name} DIV 1000")))
        case TimestampNTZType =>
          acc.withColumn(f.name, col(f.name).cast(TimestampType))
        case _ => acc
      }
    }
  }

  /** DDL-on-demand (SURVEY §2.1 S7): idempotently (re)register every
    * fixture table as a temp view — the `CREATE TABLE IF NOT EXISTS`
    * analog of the reference's with_table bootstrap
    * (/root/reference/clients/dynamodb.py:9-49) — so SQL users can
    * query by bare name: `spark.sql("SELECT ... FROM lineitem")`.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
