package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bucketing

/** 100 TB posture: joins over co-bucketed tables must plan with no
  * shuffle on either side (pay the partitioning once at ingest,
  * never again per query).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("co-bucketed fact-fact join plans with zero Exchange") {
    val base = Files.createTempDirectory("bucketed").toString
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "li_bucketed", "k", 8, s"$base/li")
    Bucketing.writeBucketed(o, "o_bucketed", "k", 8, s"$base/o")
    // disable auto-broadcast: at this tiny scale everything would
    // broadcast, hiding the shuffle question the spec exists to answer
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.cojoin(spark, "li_bucketed", "o_bucketed", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange"),
        "bucketed join should not shuffle either side:\n" + plan.take(2000))
      // and it is still the same result as the plain join
      assert(joined.count() == li.join(o, "k").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("bucketed group-by on the bucket key avoids the aggregation shuffle") {
    val base = Files.createTempDirectory("bucketed_agg").toString
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    Bucketing.writeBucketed(li, "li_bucketed_agg", "k", 8, s"$base/li")
    val agg = spark.table("li_bucketed_agg")
      .groupBy("k").agg(count(lit(1)).as("cnt"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "group-by on the bucket key should not shuffle:\n" + plan.take(2000))
    assert(agg.count() == li.select("k").distinct().count())
    spark.sql("DROP TABLE IF EXISTS li_bucketed_agg")
  }
}
