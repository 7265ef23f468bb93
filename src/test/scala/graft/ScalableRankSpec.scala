package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.ScalableRank

/** The range-partitioned rank must be BIT-IDENTICAL to the window
  * rank/ntile it replaces (q_decile_bands keeps its oracle), while
  * actually spreading a group's sort across partitions instead of
  * one task per group value.
  */
class ScalableRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def orders = Tables(spark, dir, "orders")
    .select(col("o_orderpriority").as("g"), col("o_orderkey").as("k"),
      col("o_totalprice").cast("decimal(18,2)").as("p"))

  test("withRank == window row_number on the orders fixture") {
    val got = ScalableRank.withRank(orders, 16, "g", Seq("p", "k"), "rk")
      .select(col("k"), col("rk"))
    val w = Window.partitionBy("g").orderBy(col("p"), col("k"))
    val want = orders
      .withColumn("rk", row_number().over(w).cast("long"))
      .select(col("k"), col("rk"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    Caches.releaseAll()
  }

  test("withNtile == window ntile, including non-divisible group " +
    "sizes and a skewed group") {
    import spark.implicits._
    // one dominant group (size not divisible by 10) + tiny groups:
    // exercises the q+1/q tile-size split and the skew case the
    // operator exists for
    val skewed = ((1 to 4217).map(i => ("big", i.toLong)) ++
      (1 to 7).map(i => ("s1", (10000 + i).toLong)) ++
      Seq(("s2", 20001L))).toDF("g", "k")
      .withColumn("p", pmod(col("k") * 37, lit(1000)))
    for (df <- Seq(orders, skewed)) {
      val got = ScalableRank.withNtile(df, 16, "g", Seq("p", "k"), 10, "b")
        .select(col("k"), col("b"))
      val w = Window.partitionBy("g").orderBy(col("p"), col("k"))
      val want = df.withColumn("b", ntile(10).over(w).cast("long"))
        .select(col("k"), col("b"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty)
    }
    Caches.releaseAll()
  }

  test("q_quantile_scalable: rank-selection quantiles equal the " +
    "percentile-aggregate formulation bit for bit") {
    val got = graft.operators.Relational
      .q_quantile_scalable(spark, dir).collect()
    val want = graft.operators.Relational
      .q_agg_quantile(spark, dir).collect()
    assert(got.nonEmpty)
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
    Caches.releaseAll()
  }

  test("the sort spreads wider than one task per group: max partition " +
    "size stays under the biggest group's row count") {
    val np = 16
    val keyed = orders.repartitionByRange(np,
      col("g"), col("p"), col("k"))
    val partSizes = keyed
      .groupBy(spark_partition_id().as("pid")).count()
      .collect().map(_.getLong(1))
    val biggestGroup = orders.groupBy("g").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(partSizes.length > 1)
    assert(partSizes.max < biggestGroup,
      s"range partitioning did not split groups: max part ${partSizes.max}" +
        s" vs biggest group $biggestGroup")
  }
}
