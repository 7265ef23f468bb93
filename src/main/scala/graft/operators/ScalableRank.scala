package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact global per-group ranking whose parallelism is the shuffle
  * partition count, not the group count.
  *
  * `Window.partitionBy(grp).orderBy(ord)` is the idiomatic ranking
  * plan, but its parallelism ceiling is the number of DISTINCT group
  * values: with a 5-value key each window task sorts n/5 rows alone —
  * exactly the super-linear watch item BENCH_SCALE flagged for
  * q_decile_bands (13× for 10× data; 5 tasks sorting ~3M rows each).
  * At 100 TB a 5-task sort is a non-starter, yet the BAND MEMBERSHIP
  * output (every row labeled) genuinely needs a total order per
  * group, so the fix must keep exact semantics.
  *
  * Plan here (the classic range-partitioned rank):
  *  1. `repartitionByRange(np, grp, ord…)` — ONE shuffle; the range
  *     partitioner splits big groups across many partitions while
  *     keeping the concatenation of partitions globally sorted.
  *  2. `sortWithinPartitions` + `monotonically_increasing_id()` — a
  *     local in-partition index with zero extra exchange (the id is
  *     `pid << 33 | local_index`, assigned in iteration order above
  *     the local sort; both expressions are non-deterministic-marked
  *     so Catalyst never reorders them below the sort).
  *  3. per-(partition, group) row counts — a TINY aggregate
  *     (≤ np × groups rows); a prefix sum over partition ids turns it
  *     into each partition's per-group rank offset.
  *  4. broadcast the offsets back: rank = offset + (local index −
  *     first local index of the group in this partition) + 1.
  *
  * Cost: one range shuffle of the data + one small aggregate — versus
  * the window plan's one hash shuffle + a sort bounded by #groups
  * tasks. Output is identical (ties are impossible when `ord` ends in
  * a unique key, which callers must ensure).
  *
  * The input frame is persisted (via [[graft.Caches]]) because both
  * the offset aggregate and the final join must observe the SAME id
  * assignment.
  */
object ScalableRank {

  /** Integer division on non-negative longs. `(a - a%b)/b` is exact:
    * the numerator is exactly divisible, and all values stay far
    * below 2^53 where double division of exact multiples is exact.
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Adds `rankName`: the exact 1-based rank of each row within its
    * `grpCol` group under `ordCols` order (which must make the order
    * total, e.g. by ending in a unique key).
    */
  def withRank(df: DataFrame, numPartitions: Int, grpCol: String,
               ordCols: Seq[String], rankName: String): DataFrame = {
    val keys = (grpCol +: ordCols).map(col)
    // pinned, not just cached (beyond the SAME-id-assignment argument
    // above): the offset frame is BROADCAST into the final join, so
    // its exchange thread races the stream side's cold fill and both
    // recompute the range shuffle (the q_als/q_conformal disease —
    // ADVICE r9's pin discipline applied here too)
    val keyed = graft.Caches.pinned(
      df.repartitionByRange(numPartitions, keys: _*)
        .sortWithinPartitions(keys: _*)
        .withColumn("__pid", spark_partition_id().cast("long"))
        .withColumn("__lid",
          monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1))))
    val parts = keyed.groupBy(col("__pid"), col(grpCol))
      .agg(count(lit(1)).as("__cnt"), min(col("__lid")).as("__lid0"))
    val offW = Window.partitionBy(grpCol).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = parts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(offW), lit(0L)))
      .select(col("__pid"), col(grpCol), col("__lid0"), col("__off"))
    keyed.join(broadcast(offs), Seq("__pid", grpCol))
      .withColumn(rankName,
        col("__off") + col("__lid") - col("__lid0") + lit(1L))
      .drop("__pid", "__lid", "__lid0", "__off")
  }

  /** Adds `bandName`: `ntile(n)` over (partitionBy grpCol, orderBy
    * ordCols), computed from the scalable rank + per-group totals via
    * the SQL-standard ntile arithmetic (q = N/n rows per tile, the
    * first N%n tiles take one extra row) instead of a #groups-wide
    * window sort. Bit-for-bit the window ntile's output.
    */
  def withNtile(df: DataFrame, numPartitions: Int, grpCol: String,
                ordCols: Seq[String], n: Int, bandName: String): DataFrame = {
    val ranked = withRank(df, numPartitions, grpCol, ordCols, "__rk")
    val totals = ranked.groupBy(col(grpCol)).agg(count(lit(1)).as("__n"))
    val q = idiv(col("__n"), lit(n.toLong))
    val r = pmod(col("__n"), lit(n.toLong))
    val fat = r * (q + 1) // rows covered by the (q+1)-sized tiles
    ranked.join(broadcast(totals), Seq(grpCol))
      .withColumn(bandName,
        when(col("__rk") <= fat, idiv(col("__rk") - 1, q + 1))
          .otherwise(r + idiv(col("__rk") - 1 - fat, q)) + 1)
      .drop("__rk", "__n")
  }
}
