package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Per-column data profiling — the quality pass an ingest pipeline
  * runs before accepting a drop (null counts, distincts, ranges).
  * One pass over the data: all per-column aggregates go into a single
  * Aggregate node (Catalyst evaluates them together — no per-column
  * scans), then one row per column is carved out of the single result
  * row with an explode. Everything is stringified so heterogeneous
  * column types share one result schema.
  */
object Profiler {

  /** @param exact true = exact countDistinct — Catalyst expands N
    *   distinct aggregates into an N-way Expand of the input; fine at
    *   test scale and required for the oracle-declared q_profile.
    *   false = approx_count_distinct (HLL++, one pass, constant
    *   memory) — the 100 TB default: profiling a petabyte drop must
    *   not multiply the scanned rows by the column count.
    */
  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.columns.toSeq
    def sOf(c: Column): Column = c.cast("string")
    def nd(c: Column): Column =
      if (exact) countDistinct(c) else approx_count_distinct(c, 0.01)
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        nd(col(c)).as(s"${c}__distinct"),
        sOf(min(col(c))).as(s"${c}__min"),
        sOf(max(col(c))).as(s"${c}__max"))
    } :+ count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // carve one output row per column from the single aggregate row
    // with ONE explode — a union of per-column selects here would let
    // Catalyst prune each branch into its own aggregation of the
    // input, i.e. N scans of the table instead of one
    val entries = array(cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"${c}__nonnull").as("n_nonnull"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_str"),
        col(s"${c}__max").as("max_str"))
    }: _*)
    one.select(col("__total"), explode(entries).as("e"))
      .select(col("e.col_name").as("col_name"),
        col("e.n_nonnull").as("n_nonnull"),
        (col("__total") - col("e.n_nonnull")).as("n_null"),
        col("e.n_distinct").as("n_distinct"),
        col("e.min_str").as("min_str"), col("e.max_str").as("max_str"))
      .orderBy("col_name")
  }

  /** Declared profiling query over the customer table. The double
    * column is pre-cast to DECIMAL(18,2) so the stringified min/max
    * have one canonical text form in any engine (raw double→string
    * formatting is engine-specific).
    */
  def q_profile(s: SparkSession, dir: String): DataFrame =
    profile(Tables(s, dir, "customer")
      .withColumn("c_acctbal", col("c_acctbal").cast("decimal(18,2)")))

  /** The 100 TB profiling default, declared: approx_count_distinct
    * (HLL++) keeps the plan ONE pass — a single Aggregate, no Expand
    * multiplying scanned rows by column count (PlanSpec asserts the
    * shape). Rows-only check: the sketch is engine-specific, so no
    * DuckDB twin (SURVEY §2.12 omission rule), same as
    * q_agg_approx_distinct.
    */
  def q_profile_approx(s: SparkSession, dir: String): DataFrame =
    profile(Tables(s, dir, "customer")
      .withColumn("c_acctbal", col("c_acctbal").cast("decimal(18,2)")),
      exact = false)
}
