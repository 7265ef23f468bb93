package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4 / 100 TB posture). AQE's
  * skew-join split handles moderate skew automatically; explicit
  * salting is the manual escape hatch for pathological hot keys
  * (one key holding a double-digit percentage of a fact table),
  * where even a split partition overwhelms a single task.
  */
object SkewUtils {

  /** Salted equi-join: the big (skewed) side gets a deterministic
    * salt in [0, salts) derived from its full row hash; the small
    * side is replicated `salts` times; the join key becomes
    * (key, salt), spreading each hot key over `salts` tasks.
    * Result set is identical to `big.join(small, key, joinType)`
    * for the supported join types.
    *
    * Supported joinType: inner, left/left_outer, left_semi,
    * left_anti — the types where unmatched SMALL-side rows never
    * reach the output. right/full outer are rejected: the small side
    * is replicated `salts` times, so each of its unmatched rows
    * would surface `salts` times instead of once.
    *
    * Deterministic salting (row-hash, not rand()) keeps re-runs and
    * retried tasks reproducible — the same property the LWW sink
    * relies on.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
    salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left_outer/left_semi/left_anti, not '$joinType': " +
        "replicating the small side would duplicate its unmatched rows " +
        "in right/full outer results")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts.toLong)))
    val exploded = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Top-n key frequencies — the diagnostic that decides whether to
    * salt (run it on a sample at scale).
    */
  def keySkew(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(key).count().orderBy(col("count").desc, col(key)).limit(topN)
}
