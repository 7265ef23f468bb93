package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import graft.Tables

/** Bloom-filter pre-filtered join — the standard 100 TB
  * shuffle-reduction pattern: build a compact Bloom filter over the
  * SELECTIVE side's join keys (one small aggregation), then filter
  * the 100 TB probe side with `might_contain` BEFORE its shuffle, so
  * rows that cannot possibly match never leave the map side. The
  * real equi-join still runs afterwards, so false positives are
  * eliminated and the result is EXACT — which is why q_join_bloom is
  * fully oracle-declarable as a plain join.
  *
  * This is the same machinery Spark's own AQE runtime filter
  * (spark.sql.optimizer.runtime.bloomFilter.enabled) injects when
  * statistics justify it; here it is an explicit operator with
  * explicit sizing knobs, because a pipeline author at 100 TB wants
  * the reduction guaranteed, not left to stats-based heuristics. The
  * Bloom binary reaches the probe side as an uncorrelated scalar
  * subquery (computed once, broadcast into the predicate) — the
  * identical plan shape the built-in injection produces, with no
  * driver-side collect.
  */
object BloomJoin {
  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Expected distinct keys on the build side — a sizing knob the
    * caller owns (at 100 TB: the cardinality estimate of the
    * selective dimension subset). 2^16 at ~1% fpp costs ~77 KiB —
    * negligible to broadcast, prunes ~99% of non-matching probes.
    */
  val defaultExpectedItems = 1L << 16
  val defaultFpp = 0.01

  /** Restrict `probe` to rows whose `probeKey` might be present in
    * `buildKeys` (single-column frame), with false-positive rate
    * `fpp`. Exact superset of the true semi-join; pair with the real
    * join to make the final result exact.
    */
  def preFilter(
      probe: DataFrame, probeKey: Column,
      buildKeys: DataFrame, buildKey: Column,
      expectedItems: Long = defaultExpectedItems,
      fpp: Double = defaultFpp): DataFrame = {
    val bloomAgg = new BloomFilterAggregate(
      GraftColumnBridge.expression(xxhash64(buildKey)),
      Literal(expectedItems),
      Literal(BloomFilter.optimalNumOfBits(expectedItems, fpp)))
      .toAggregateExpression()
    val bloomDf = buildKeys.agg(GraftColumnBridge.column(bloomAgg).as("bloom"))
    // empty build side ⇒ the aggregate yields NULL ⇒ might_contain is
    // NULL ⇒ zero probe rows pass — the correct inner-join prefilter
    val pred = BloomFilterMightContain(
      ScalarSubquery(bloomDf.queryExecution.analyzed),
      GraftColumnBridge.expression(xxhash64(probeKey)))
    probe.where(GraftColumnBridge.column(pred))
  }

  /** J1 at scale: lineitem ⨝ high-value orders (~4% of orders), with
    * the Bloom prefilter cutting the lineitem shuffle to the ~4% of
    * rows that can match. Result is exact (the equi-join follows),
    * so the oracle is the plain SQL join with no bloom at all.
    */
  def q_join_bloom(s: SparkSession, dir: String): DataFrame = {
    val sel = t(s, dir, "orders")
      .filter(col("o_totalprice") > 480000)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val pre = preFilter(
      t(s, dir, "lineitem"), col("l_orderkey"),
      sel.select("o_orderkey"), col("o_orderkey"))
    pre.join(sel, pre("l_orderkey") === sel("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("cnt"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double"), 2).as("revenue"))
      .orderBy("o_orderpriority")
  }
}
