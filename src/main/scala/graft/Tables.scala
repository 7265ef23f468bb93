package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver-generated star schema
  * (TESTDATA.md). One parquet file per table under `$dir/`.
  *
  * Scale posture: `spark.read.parquet` gives us the vectorized
  * columnar reader, predicate pushdown and column pruning for free;
  * at cluster scale the same call pattern works over a partitioned
  * directory tree — nothing here assumes single-file layout.
  *
  * Nanosecond timestamps: `events.ts` is TIMESTAMP(NANOS) in parquet,
  * which Spark has no native type for (PARQUET_TYPE_ILLEGAL without
  * the legacy conf). Sessions must set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (graft.Verify /
  * graft.Bench / specs do); the loader then truncates nanos → µs
  * TimestampType here, exactly matching DuckDB's ns → µs truncation
  * (SURVEY §2.12 rule 5 / FIXTURES.md §1).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        // ns-since-epoch long → µs TimestampType (floor division ≡
        // DuckDB truncation; ts values are post-1970 so floor = trunc)
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case None => df
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
