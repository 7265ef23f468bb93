package graft

import graft.operators.GraphOps
import org.scalatest.funsuite.AnyFunSuite

/** q_pagerank vs a driver-side reference implementation of the SAME
  * fixed-point contract (nano-unit BIGINT ranks, truncating integer
  * division) on the sf0.001 co-purchase graph. Collect here is
  * test-only — the operator itself never leaves the cluster.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def referenceRanks(): Map[String, (Long, Long)] = {
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
      .select("l_suppkey", "l_partkey").distinct().collect()
      .map(r => (r.get(0).toString, r.get(1).toString))
    val edges = li.flatMap { case (s, p) =>
      Seq(("s" + s, "p" + p), ("p" + p, "s" + s))
    }.distinct
    val deg = edges.groupBy(_._1).map { case (k, v) => (k, v.length.toLong) }
    val n = deg.size.toLong
    var rank: Map[String, Long] = deg.keys.map(k => (k, GraphOps.prScale / n)).toMap
    for (_ <- 1 to GraphOps.prIters) {
      rank = edges.groupBy(_._2).map { case (dst, in) =>
        val sc = in.map { case (src, _) => rank(src) / deg(src) }.sum
        (dst, GraphOps.prTeleportNano / n
          + (GraphOps.prDampNum * sc) / GraphOps.prDampDen)
      }
    }
    rank.map { case (k, nr) => (k, (deg(k), nr)) }
  }

  test("q_pagerank matches the fixed-point reference exactly, top-50 ordered") {
    val got = GraphOps.q_pagerank(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = referenceRanks().toSeq
      .map { case (node, (deg, nr)) =>
        (node, deg, nr.toDouble / GraphOps.prScale.toDouble)
      }
      .sortBy { case (node, _, pr) => (-pr, node) }
      .take(50)
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"got $g want $w") }
  }

  test("rank mass is conserved within truncation loss") {
    // every truncating division loses < 1 nano-unit, and there is one
    // per edge contribution plus two per node per iteration (plus the
    // r0 seeding) — a vanishing fraction of the 1e9 total; mass never
    // grows because truncation only rounds down
    val full = referenceRanks().values.map(_._2).sum
    assert(full <= GraphOps.prScale, s"mass grew: $full")
    assert(full > (GraphOps.prScale * 999L) / 1000L, s"mass $full")
  }
}
