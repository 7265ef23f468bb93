package graft

import graft.functions.TopKAgg
import org.scalatest.funsuite.AnyFunSuite

class TopKAggSpec extends AnyFunSuite {

  /** Fold a stream through the aggregator in `chunks` partials, then
    * merge — simulates Spark's partial/final aggregation under an
    * arbitrary partitioning.
    */
  private def topk(agg: TopKAgg, xs: Seq[(Long, Long)], chunks: Int): Seq[(Long, Long)] = {
    val partials = xs.grouped(math.max(1, xs.size / chunks))
      .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    agg.finish(partials.reduce(agg.merge))
  }

  test("result is the exact top-k under any partitioning and input order") {
    val agg = new TopKAgg(3)
    val xs = Seq[(Long, Long)](
      (10, 1), (50, 2), (50, 9), (7, 3), (99, 4), (50, 5), (1, 6), (99, 7))
    val want = Seq[(Long, Long)]((99, 4), (99, 7), (50, 2))
    for (chunks <- Seq(1, 2, 3, 8); seed <- Seq(1, 7)) {
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      assert(topk(agg, shuffled, chunks) == want, s"chunks=$chunks seed=$seed")
    }
  }

  test("partial state never exceeds k entries") {
    val agg = new TopKAgg(2)
    val grown = (1L to 100L).foldLeft(agg.zero)((b, i) => agg.reduce(b, (i, i)))
    assert(grown.size == 2)
    assert(agg.merge(grown, grown).size == 2)
  }

  test("fewer than k inputs pass through complete and ordered") {
    val agg = new TopKAgg(5)
    assert(topk(agg, Seq((3L, 30L), (9L, 10L)), 2) == Seq((9L, 10L), (3L, 30L)))
  }
}
