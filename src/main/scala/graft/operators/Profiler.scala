package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Per-column data profiling — the quality pass an ingest pipeline
  * runs before accepting a drop (null counts, distincts, ranges).
  * One pass over the data: all per-column aggregates go into a single
  * Aggregate node (Catalyst evaluates them together — no per-column
  * scans), then one row per column is carved out with a stack().
  * Everything is stringified so heterogeneous column types share one
  * result schema.
  */
object Profiler {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    def sOf(c: Column): Column = c.cast("string")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        sOf(min(col(c))).as(s"${c}__min"),
        sOf(max(col(c))).as(s"${c}__max"))
    } :+ count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // carve one output row per column from the single aggregate row
    val stackArgs = cols.map { c =>
      Seq(lit(c),
        col(s"${c}__nonnull"), col(s"${c}__distinct"),
        col(s"${c}__min"), col(s"${c}__max"))
    }
    val stacked = stackArgs.map { args =>
      one.select(col("__total"),
        args(0).as("col_name"), args(1).as("n_nonnull"),
        args(2).as("n_distinct"), args(3).as("min_str"), args(4).as("max_str"))
    }.reduce(_.unionByName(_))
    stacked
      .select(col("col_name"), col("n_nonnull"),
        (col("__total") - col("n_nonnull")).as("n_null"),
        col("n_distinct"), col("min_str"), col("max_str"))
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
}
