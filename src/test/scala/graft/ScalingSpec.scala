package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Empirical scale posture: the near-dup operators' candidate growth,
  * measured. A degenerate LSH (constant bucket space — the defect
  * class round 1 flagged for embed-dedup and round 2 for simhash)
  * shows up here as quadratic pair blow-up on a doubled corpus; a
  * healthy one grows ~linearly (each injected twin adds one pair).
  */
class ScalingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val twinOffset = 1000000L

  /** k-times corpus: copy i appends two unique junk tokens, so each
    * copy is a NEAR-duplicate twin of the base doc (high shingle
    * Jaccard, small simhash hamming), never an exact duplicate.
    */
  private def stage(k: Int): String = {
    val dir = Files.createTempDirectory(s"scale_corpus_$k")
    val base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val multi = (0 until k).map { i =>
      if (i == 0) base
      else base.select(
        (col("doc_id") + lit(i * twinOffset)).as("doc_id"),
        concat(col("text"), lit(s" zqxa$i zqxb$i")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_.unionByName(_))
    multi.write.parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("minhash LSH: doubled corpus grows pairs ~linearly and recalls " +
    "the injected twins") {
    val d1 = stage(1)
    val d2 = stage(2)
    val nDocs = spark.read.parquet(s"$d1/documents.parquet").count()
    val p1 = TextOps.q_dedup_minhash(spark, d1).count()
    val pairs2 = TextOps.q_dedup_minhash(spark, d2)
    val p2 = pairs2.count()
    // each base pair can appear in 4 twin combinations, plus at most
    // one (doc, twin) pair per doc — the LINEAR envelope; a constant-
    // bucket-space LSH would exceed it by an order of magnitude
    assert(p2 <= 4 * p1 + nDocs,
      s"pair count $p2 exceeds linear envelope (base $p1, docs $nDocs)")
    // and the banding actually finds the twins (recall, not vacuity)
    val twinHits = pairs2
      .filter(col("b_id") === col("a_id") + twinOffset).count()
    assert(twinHits >= nDocs / 2,
      s"only $twinHits/$nDocs injected twins recalled")
  }

  test("simhash LSH: doubled corpus grows pairs ~linearly and recalls " +
    "the injected twins") {
    val d1 = stage(1)
    val d2 = stage(2)
    val nDocs = spark.read.parquet(s"$d1/documents.parquet").count()
    val p1 = TextOps.q_dedup_simhash(spark, d1).count()
    val pairs2 = TextOps.q_dedup_simhash(spark, d2)
    val p2 = pairs2.count()
    assert(p2 <= 4 * p1 + nDocs,
      s"pair count $p2 exceeds linear envelope (base $p1, docs $nDocs)")
    val twinHits = pairs2
      .filter(col("b_id") === col("a_id") + twinOffset).count()
    assert(twinHits >= nDocs / 2,
      s"only $twinHits/$nDocs injected twins recalled")
  }
}
