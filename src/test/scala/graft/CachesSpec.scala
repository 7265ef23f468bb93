package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared-intermediate cache modes (graft.Caches.modeKey) must be
  * a pure execution-strategy knob: `none` (recompute-per-consumer, the
  * fifth-decade posture where the exploded shingle table exceeds
  * RAM+scratch) and `disk` must produce bit-identical results to the
  * default persist mode, and `none` must leave NOTHING persisted.
  */
class CachesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(mode: String, q: String): Seq[String] = {
    spark.conf.set(Caches.modeKey, mode)
    try {
      val rows = SparkEntry.queries(q)(spark, dir)
        .collect().map(_.toString).toSeq
      rows
    } finally {
      Caches.releaseAll()
      spark.conf.set(Caches.modeKey, "persist")
    }
  }

  test("cache mode none/disk ≡ persist on the shingle family, and " +
    "none leaves the cache manager empty") {
    for (q <- Seq("q_dedup_ngram", "q_dedup_minhash", "q_boilerplate")) {
      val base = run("persist", q)
      spark.sharedState.cacheManager.clearCache()
      val none = run("none", q)
      assert(none == base, s"$q: recompute mode diverged from persist")
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$q: cache mode none still persisted something")
      val disk = run("disk", q)
      assert(disk == base, s"$q: disk mode diverged from persist")
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
