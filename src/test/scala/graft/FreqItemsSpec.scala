package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FreqItemsAgg
import graft.operators.TextOps

class FreqItemsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  /** Fold a stream through the aggregator in `chunks` partitions,
    * merging partials in order — simulates Spark's partial/final
    * aggregation with an arbitrary partitioning.
    */
  private def sketch(agg: FreqItemsAgg, stream: Seq[String],
    chunks: Int): Map[String, Long] = {
    val partials = stream.grouped(math.max(1, stream.size / chunks))
      .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    partials.reduce(agg.merge)
  }

  test("distinct items ≤ k ⇒ the sketch is exact (no eviction path)") {
    val agg = new FreqItemsAgg(8)
    val stream = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(7)("c")
    for (chunks <- Seq(1, 2, 5)) {
      val got = sketch(agg, stream, chunks)
      assert(got == Map("a" -> 5L, "b" -> 3L, "c" -> 7L), s"chunks=$chunks")
    }
  }

  test("MG bounds under forced eviction: counters are lower bounds " +
    "with undercount ≤ N/(k+1); heavy items always survive") {
    val k = 4
    val agg = new FreqItemsAgg(k)
    // 40 distinct light items (10× the summary width forces constant
    // eviction) + one heavy item well above N/(k+1)
    val light = (0 until 40).flatMap(i => Seq.fill(3)(s"light$i"))
    val heavy = Seq.fill(60)("HEAVY")
    // deterministic interleave (no RNG in tests): round-robin blocks
    val stream = (light.grouped(4) zip heavy.grouped(2))
      .flatMap { case (l, h) => l ++ h }.toSeq ++
      light.drop(heavy.size * 2) // any tail remainder
    val n = stream.size
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (chunks <- Seq(1, 3, 7)) {
      val got = sketch(agg, stream, chunks)
      assert(got.size <= k)
      got.foreach { case (t, c) =>
        assert(c <= exact(t), s"counter for $t overcounts: $c > ${exact(t)}")
        assert(exact(t) - c <= n.toLong / (k + 1),
          s"undercount for $t exceeds N/(k+1): ${exact(t) - c}")
      }
      // the guarantee the two-pass pattern rests on
      assert(got.contains("HEAVY"), s"heavy item evicted (chunks=$chunks)")
    }
  }

  test("finish orders by count desc then item asc") {
    val agg = new FreqItemsAgg(8)
    val out = agg.finish(Map("b" -> 2L, "a" -> 2L, "c" -> 9L))
    assert(out == Seq("c" -> 9L, "a" -> 2L, "b" -> 2L))
  }

  test("q_heavy_hitters equals the brute-force top-10 (two-pass " +
    "composition is exact on the fixture)") {
    val got = TextOps.q_heavy_hitters(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val brute = Tables(spark, dir, "documents")
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == brute)
    assert(got.size == 10)
  }
}
