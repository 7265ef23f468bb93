package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-count invariance: a declared query's OUTPUT must not
  * depend on spark.sql.shuffle.partitions — the one knob every
  * deployment sets differently from the test session. Catches the
  * classic scale bugs: partition-order-dependent float folds,
  * first()/collect_list order leaking into results, per-partition
  * sampling that changes with parallelism. Representative queries
  * cover each risk family: exact decimal aggregation (q_agg_stats),
  * float vector folds (q_sim_topk), corpus-relative scoring
  * (q_tfidf), gate + aggregate composition (q_corpus_stats),
  * centroid means (q_dedup_semantic), window + sampling
  * (q_sample_weighted), bounded top-k aggregation (q_group_topk).
  */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private val queries = Seq("q_agg_stats", "q_sim_topk", "q_tfidf",
    "q_corpus_stats", "q_dedup_semantic", "q_sample_weighted",
    // typed-Aggregator partial/merge order is partition-dependent —
    // TopKAgg's total order must make the result invariant anyway
    "q_group_topk",
    // decimal-summed BM25 contributions must not depend on addition
    // order; postings arrays come from collect_list, whose raw order
    // IS partition-dependent — sort_array must canonicalize it
    "q_bm25", "q_postings",
    // r6s3 families: generator-explode decimal moments (q_vec_cov),
    // map-carried vector dot folds (q_sparse_sim), hash-drawn
    // replica weights + decimal sums (q_bootstrap), driver-side
    // eigen over a collected summary + decimal projection moments
    // (q_vec_pca — the collect must see the same cells regardless
    // of partitioning)
    "q_vec_cov", "q_sparse_sim", "q_bootstrap", "q_vec_pca",
    // r7 families: BootstrapAgg's partial buffers merge in
    // partition-dependent order (elementwise exact-integer adds must
    // commute — q_bootstrap above now exercises the Aggregator
    // form); encoded-long graph rounds (q_label_prop — struct-min
    // argmax over long keys, decode of the top-20), md5-sampled
    // covariance (q_vec_cov_sample), streaming drain through a
    // parquet landing dir + stage fold (q_stream_funnel)
    "q_label_prop", "q_vec_cov_sample", "q_stream_funnel",
    // r8 families: driver-held iterative model over exact-decimal
    // gradient sums (q_logreg — each step's 9-dp-rounded decimal
    // terms must fold to the same gradient under any partitioning,
    // or the weights walk different paths), and the one-scan window
    // rewrite of the correlated-scalar shape (q_subquery_scalar_1scan)
    "q_logreg", "q_subquery_scalar_1scan",
    // r8 session 2: commutative-fold streaming histogram (q_stream_psi)
    // and the exact-decimal stump-cell argmin (q_boost)
    "q_stream_psi", "q_boost")

  test("declared outputs are identical under 3 vs 7 shuffle partitions") {
    val conf = spark.conf
    val prev = conf.get("spark.sql.shuffle.partitions")
    try {
      val runs = Seq("3", "7").map { parts =>
        conf.set("spark.sql.shuffle.partitions", parts)
        Caches.releaseAll() // cached subplans pin the old partitioning
        queries.map { q =>
          q -> SparkEntry.queries(q)(spark, dir).collect().toSeq
        }.toMap
      }
      queries.foreach { q =>
        assert(runs(0)(q) == runs(1)(q),
          s"$q output changed with shuffle partition count")
        assert(runs(0)(q).nonEmpty, s"$q empty — vacuous")
      }
    } finally {
      conf.set("spark.sql.shuffle.partitions", prev)
      Caches.releaseAll()
    }
  }
}
