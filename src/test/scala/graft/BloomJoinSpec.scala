package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BloomJoin

class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = TestSpark.sf0001

  private def sel = Tables(spark, dir, "orders")
    .filter(col("o_totalprice") > 480000).select("o_orderkey")

  test("prefilter plans a might_contain predicate fed by a scalar " +
    "subquery (no driver collect, no extra shuffle on the probe side)") {
    val pre = BloomJoin.preFilter(
      Tables(spark, dir, "lineitem"), col("l_orderkey"), sel, col("o_orderkey"))
    val plan = pre.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    assert(plan.contains("Subquery") || plan.contains("subquery"),
      plan.take(2000))
  }

  test("prefilter output is a superset of true matches, prunes most " +
    "non-matches, and the composed join stays exact") {
    val li = Tables(spark, dir, "lineitem")
    val s1 = sel
    val total = li.count()
    val exact = li.join(s1, li("l_orderkey") === s1("o_orderkey"),
      "left_semi").count()
    val pre = BloomJoin.preFilter(li, col("l_orderkey"), s1, col("o_orderkey"))
    val preN = pre.count()
    assert(preN >= exact, s"bloom dropped true matches: $preN < $exact")
    // at fpp=1% the false-positive overhead is a few % of non-matches
    assert(preN <= exact + (total - exact) / 10,
      s"bloom barely pruned: $preN of $total (exact $exact)")
    // the declared query equals the bloom-free formulation row-for-row
    val withBloom = BloomJoin.q_join_bloom(spark, dir).collect().toSeq
    val noBloom = {
      val s2 = Tables(spark, dir, "orders")
        .filter(col("o_totalprice") > 480000)
        .select(col("o_orderkey"), col("o_orderpriority"))
      li.join(s2, li("l_orderkey") === s2("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double"), 2).as("revenue"))
        .orderBy("o_orderpriority").collect().toSeq
    }
    assert(withBloom == noBloom)
  }

  test("empty build side ⇒ prefilter passes zero rows (NULL bloom " +
    "gives the correct inner-join prefilter semantics)") {
    val empty = Tables(spark, dir, "orders")
      .filter(col("o_totalprice") < 0).select("o_orderkey")
    val pre = BloomJoin.preFilter(
      Tables(spark, dir, "lineitem"), col("l_orderkey"),
      empty, col("o_orderkey"))
    assert(pre.count() == 0)
  }
}
