package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CentroidAgg
import graft.operators.VectorOps

class CentroidAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("centroid aggregator computes per-group mean vectors") {
    val df = Seq(
      (0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 4.0f)),
      (1, Seq(10.0f, 0.0f))).toDF("label", "embedding")
    val centroidOf = udaf(CentroidAgg)
    val got = df.groupBy("label").agg(centroidOf($"embedding").as("c"))
      .orderBy("label").as[(Int, Seq[Double])].collect().toSeq
    assert(got == Seq((0, Seq(2.0, 3.0)), (1, Seq(10.0, 0.0))))
  }

  test("centroid aggregator merges partial buffers across partitions") {
    val rows = (1 to 1000).map(i => (i % 4, Seq(i.toFloat, (2 * i).toFloat)))
    val df = spark.createDataFrame(rows).toDF("label", "embedding")
      .repartition(13)
    val centroidOf = udaf(CentroidAgg)
    val got = df.groupBy("label").agg(centroidOf($"embedding").as("c"))
      .orderBy("label").as[(Int, Seq[Double])].collect()
    got.foreach { case (label, c) =>
      val members = rows.filter(_._1 == label).map(_._2)
      val expect = Seq(
        members.map(_(0).toDouble).sum / members.size,
        members.map(_(1).toDouble).sum / members.size)
      assert(math.abs(c(0) - expect(0)) < 1e-9 &&
        math.abs(c(1) - expect(1)) < 1e-9, s"label $label")
    }
  }

  test("q_ann_ivf still returns a ranked non-empty result") {
    val out = VectorOps.q_ann_ivf(spark, TestSpark.sf0001).collect()
    assert(out.nonEmpty)
    val sims = out.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }
}
