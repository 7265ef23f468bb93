package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** Exact trailing time-RANGE window aggregates whose parallelism is
  * (partition key × time bucket), not the partition-key cardinality.
  *
  * `Window.partitionBy(key).orderBy(ts).rangeBetween(-W, 0)` sorts
  * each key's ENTIRE history in one task — with a 5-value key that is
  * a 5-task sort at any scale (q_rolling_time's 3.2×/9.3× decade
  * ratios in BENCH_SCALE, the engine's worst). The halo rewrite keeps
  * the semantics bit-identical:
  *
  *  1. bucket time into width-W cells;
  *  2. fan every row into its OWN bucket (home copy) and the NEXT
  *     bucket (halo copy) — a map-side 2× explode, no extra pass;
  *  3. run the same range frame partitioned by (key, bucket): a row
  *     at time t in bucket b has its whole trailing (t−W, t] inside
  *     the partition, because the window reaches at most into bucket
  *     b−1, whose rows are present as halo copies (W ≤ bucket width
  *     makes deeper reach impossible), and each earlier event exists
  *     exactly once in the partition — no double count;
  *  4. keep only home-copy rows (halo copies lack THEIR OWN halo, so
  *     their frames are garbage — they exist only as context).
  *
  * Cost: the shuffle carries 2× rows, but partitions are
  * (key × bucket)-grained — thousands of ~constant-size sorts instead
  * of #keys corpus-wide ones. At 100 TB this is the difference
  * between a 5-task stage and full cluster width.
  */
object RangeHalo {

  /** Fans `df` for a trailing `widthSec` range frame over `tsLong`
    * (a BIGINT epoch-seconds column) per `key`. Returns the fanned
    * frame (extra columns `__wb`, `__home`) and the window spec to
    * aggregate over; callers compute their window columns, then
    * `filter(col("__home"))` and drop the helpers.
    */
  def trailing(df: DataFrame, key: String, tsLong: String,
               widthSec: Long): (DataFrame, WindowSpec) = {
    // epoch seconds are non-negative, so double-truncation == floor
    // and stays exact far below 2^53
    val bucket = (col(tsLong) / widthSec).cast("long")
    val fanned = df.withColumn("__fan",
        explode(array(
          struct(bucket.as("wb"), lit(true).as("home")),
          struct((bucket + 1).as("wb"), lit(false).as("home")))))
      .withColumn("__wb", col("__fan.wb"))
      .withColumn("__home", col("__fan.home"))
      .drop("__fan")
    val w = Window.partitionBy(col(key), col("__wb"))
      .orderBy(col(tsLong))
      .rangeBetween(-widthSec, Window.currentRow)
    (fanned, w)
  }
}
