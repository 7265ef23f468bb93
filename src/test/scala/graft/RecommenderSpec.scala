package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.sum
import graft.operators.Recommender

/** Independent driver-side BigInt re-derivation of the rank-1 ALS fit
  * (SURVEY §2.11 L74) — the q_nbayes/q_kmeans discipline: the oracle
  * twin shares the arithmetic by construction, so the spec pins the
  * SEMANTICS from a formulation that shares nothing with the query
  * plan (in-memory maps and BigInt folds vs joins and DECIMAL(38,0)
  * aggregates).
  */
class RecommenderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = TestSpark.sf0001
  private val S = BigInt(Recommender.alsScale)

  test("q_als: two-sweep fit matches a driver-side BigInt ALS " +
    "bit-for-bit; SSE descends; factors stay positive") {
    val rat = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(Tables(spark, dir, "part"), $"l_partkey" === $"p_partkey")
      .groupBy($"o_custkey", $"p_brand")
      .agg(sum($"l_quantity").cast("long").as("r"))
      .as[(Long, String, Long)].collect().toSeq

    def usweep(v: Map[String, BigInt]): Map[Long, BigInt] =
      rat.groupBy(_._1).map { case (c, rows) =>
        val num = rows.map { case (_, b, r) => BigInt(r) * v(b) }.sum
        val den = rows.map { case (_, b, _) => v(b) * v(b) }.sum
        c -> num * S * S / den
      }
    def vsweep(u: Map[Long, BigInt]): Map[String, BigInt] =
      rat.groupBy(_._2).map { case (b, rows) =>
        val num = rows.map { case (c, _, r) => BigInt(r) * u(c) }.sum
        val den = rows.map { case (c, _, _) => u(c) * u(c) }.sum
        b -> num * S * S / den
      }
    def sse(u: Map[Long, BigInt], v: Map[String, BigInt]): BigInt =
      rat.map { case (c, b, r) =>
        val d = BigInt(r) - u(c) * v(b) / S / S; d * d
      }.sum

    val v0 = rat.map(_._2).distinct.map(_ -> S).toMap
    val u1 = usweep(v0); val v1 = vsweep(u1)
    val u2 = usweep(v1); val v2 = vsweep(u2)

    val out = Recommender.q_als(spark, dir).collect()
    assert(out.length == v1.size)
    val marg = rat.groupBy(_._2)
    out.foreach { row =>
      val b = row.getString(0)
      assert(row.getLong(1) == marg(b).size, s"n_raters($b)")
      assert(row.getLong(2) == marg(b).map(_._3).sum, s"r_sum($b)")
      assert(row.getLong(3) == v1(b).toLong, s"v1($b)")
      assert(row.getLong(4) == v2(b).toLong, s"v2($b)")
      assert(row.getLong(3) > 0 && row.getLong(4) > 0, s"positivity($b)")
    }
    val h = out.head
    assert(h.getLong(5) == u2.size)
    assert(h.getLong(6) == u2.values.sum.toLong)
    assert(h.getLong(7) == u2.values.min.toLong)
    assert(h.getLong(8) == u2.values.max.toLong)
    assert(h.getLong(9) == sse(u1, v1).toLong, "sse1")
    assert(h.getLong(10) == sse(u2, v2).toLong, "sse2")
    assert(h.getLong(10) <= h.getLong(9),
      "ALS full-sweep descent survives the micro-grid floor")
  }
}
