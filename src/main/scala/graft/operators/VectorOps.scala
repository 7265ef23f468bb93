package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFns._

/** Embedding-vector operators (SURVEY §2.11 L3/L4): brute-force
  * cosine top-k (the correctness baseline), LSH-bucketed ANN (the
  * scale path), per-class vector stats, and cosine near-dup pairs.
  *
  * Scale posture: the only broadcast is the 1-row query vector; the
  * near-dup join is blocked (label × first-component sign) so the
  * pair count is ~n²/(2·|labels|·2) instead of n²/2; the ANN path
  * reduces the candidate set by 2^bits before any distance math.
  * No collect() — the query vector travels as a broadcast DataFrame.
  */
object VectorOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Cosine-similarity threshold for q_dedup_embed — the testdata has
    * no planted near-dups (max pairwise cos ≈ 0.5), so the declared
    * threshold is 0.4 to keep the contract output non-trivial.
    */
  val nearDupTau = 0.4

  /** L3 baseline: brute-force cosine top-k against the vec_id=0 query
    * vector. One scan, one broadcast of a single row, distributed
    * TakeOrderedAndProject for the top-k.
    */
  def q_sim_topk(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** L4: per-class vector stats. Per-row L2 norms are deterministic
    * sequential folds; the group-sum is made order-independent by a
    * DECIMAL(18,6) cast before aggregation (SURVEY §2.12).
    */
  def q_vec_norm(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("label"), l2norm(col("embedding")).as("l2"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), sum(col("l2").cast("decimal(18,6)")).as("sum_norm"))
      .select(col("label"), col("n"),
        round(col("sum_norm").cast("double") / col("n"), 4).as("avg_norm"))
      .orderBy("label")

  /** Embedding-cosine near-dup pairs, blocked by (label, sign of
    * first component) — both must match for a candidate pair, which
    * is the classic cheap-blocking step that keeps the join from
    * going quadratic at corpus scale.
    */
  def q_dedup_embed(s: SparkSession, dir: String): DataFrame = {
    val v = t(s, dir, "embeddings").select(
      col("vec_id"), col("label"), col("embedding"),
      (element_at(col("embedding"), 1) >= 0).as("s0"))
    val a = v.select(col("vec_id").as("a_id"), col("label"), col("s0"),
      col("embedding").as("emb_a"))
    val b = v.select(col("vec_id").as("b_id"), col("label"), col("s0"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("label", "s0")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("label"),
        round(cosine(col("emb_a"), col("emb_b")), 4).as("cos"))
      .filter(col("cos") >= nearDupTau)
      .orderBy("a_id", "b_id")
  }

  /** Bits in the sign-random-projection LSH bucket id. */
  val lshBits = 6

  /** ANN scale path: sign-random-projection LSH buckets with
    * multi-probe (the query probes its own bucket plus every
    * hamming-1 neighbor — standard multi-probe LSH, so near
    * neighbors that landed one hyperplane away are still found).
    * Candidate set shrinks ~(bits+1)/2^bits vs brute force; exact
    * cosine re-ranks within it. Not oracle-declared (the hyperplane
    * family is engine-hash-specific); the recall spec checks it
    * against q_sim_topk.
    */
  def q_ann_lsh(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .withColumn("bucket", lshBucket(col("embedding"), lshBits))
    // query row fans out to its bucket + all hamming-1 probes
    val probes = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"),
        explode(array(
          (col("bucket") +: (0 until lshBits).map(b =>
            col("bucket").bitwiseXOR(lit(1 << b)))): _*)).as("bucket"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(probes), Seq("bucket"))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** IVF-style ANN: coarse quantize to per-label centroids (stand-in
    * for k-means cells), probe the nearest centroid's inverted list
    * only. Centroids come from the one-pass typed CentroidAgg
    * (constant-size partial aggregation; see its Scaladoc for why the
    * posexplode/collect_list alternative doesn't scale). Not
    * oracle-declared.
    */
  def q_ann_ivf(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val centroidOf = udaf(graft.functions.CentroidAgg)
    val cent = e.groupBy(col("label").as("c_label"))
      .agg(centroidOf(col("embedding")).as("centroid"))
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    // nearest centroid to the query
    val probe = cent.crossJoin(broadcast(q))
      .select(col("c_label"), col("q_emb"), cosine(col("centroid"), col("q_emb")).as("cc"))
      .orderBy(col("cc").desc, col("c_label")).limit(1)
    // search only that cell's inverted list
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(probe), e("label") === probe("c_label"))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }
}
