package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewUtils

/** VERDICT r4 item #7: q_join_salted's oracle proves the salt is
  * semantics-invisible; this spec measures that it HELPS — the
  * post-shuffle partition row distribution of the salted join vs the
  * plain join on a pathologically hot key, via spark_partition_id
  * aggregation over the join output.
  *
  * Broadcast and AQE are disabled for the measurement (restored in
  * finally): a broadcast join has no shuffle to measure, and AQE's
  * skew split would defuse the PLAIN join too — the point is to
  * observe the salting itself, the manual escape hatch for the skew
  * AQE cannot split (a single key too hot for any one task).
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (max, median) of rows per output partition. */
  private def partProfile(df: DataFrame): (Long, Long) = {
    val counts = df.select(spark_partition_id().as("p"))
      .groupBy("p").count().collect().map(_.getLong(1)).sorted
    (counts.last, counts(counts.length / 2))
  }

  test("salting measurably flattens the hot key's partition: " +
    "max/median ratio bounded where the plain join concentrates") {
    val n = 50000L
    // 80% of the fact side lands on ONE key; the rest spreads over 97
    val big = spark.range(n).select(
      when($"id" % 10 < 8, lit("hot"))
        .otherwise(concat(lit("k"), $"id" % 97)).as("key"),
      $"id".as("payload"))
    val small = big.select("key").distinct()
      .withColumn("dim_val", length($"key"))
    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      val plain = big.join(small, Seq("key"))
      val salted = SkewUtils.saltedJoin(big, small, "key", salts = 8)
      // identical result set first (the semantics the oracle pins at
      // the declared-query level, re-checked on this fixture)
      assert(salted.count() == plain.count())
      val (pMax, pMed) = partProfile(plain)
      val (sMax, sMed) = partProfile(salted)
      info(s"plain  max=$pMax median=$pMed ratio=${pMax.toDouble / pMed}")
      info(s"salted max=$sMax median=$sMed ratio=${sMax.toDouble / sMed}")
      // the fixture really is pathological: the hot key concentrates
      // >=4x the median partition on the plain join
      assert(pMax.toDouble / pMed >= 4.0,
        s"fixture not skewed enough to prove anything: $pMax/$pMed")
      // salting spreads the hot key across (key, salt) tasks: bounded
      // imbalance, and the biggest task shrinks materially (the floor
      // is partition-count-limited — 8 salt groups hash onto the test
      // session's 4 shuffle partitions, so perfect halving needs
      // luckier hashing than a fixed fixture guarantees)
      assert(sMax.toDouble / sMed <= 2.0,
        s"salted join still skewed: $sMax/$sMed")
      assert(sMax <= pMax * 0.7,
        s"salting did not shrink the max partition: $sMax vs $pMax")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
