package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** VERDICT r4 item #2: q_dedup_cluster's iterative loop must survive
  * executor loss on a real cluster — localCheckpoint blocks die with
  * their executor. Checkpoints.ckpt upgrades to reliable
  * `checkpoint()` whenever the context has a checkpoint dir; this
  * spec proves (a) reliable mode actually writes checkpoint files
  * under the dir, and (b) the cluster assignments are identical to
  * local mode's.
  */
class ReliableCheckpointSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("q_dedup_cluster under a reliable checkpoint dir writes " +
    "checkpoint files and matches localCheckpoint output") {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "precondition: no checkpoint dir configured for the shared test session")
    val local = TextOps.q_dedup_cluster(spark, dir).collect().toSeq

    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    sc.setCheckpointDir(ckptDir)
    try {
      val reliable = TextOps.q_dedup_cluster(spark, dir).collect().toSeq
      assert(reliable == local,
        "reliable-checkpoint mode changed cluster assignments")
      // prove the reliable path was actually taken: RDD checkpoints
      // materialize as rdd-*/part-* files under the configured dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .count()
      assert(wrote > 0, s"no checkpoint part files under $ckptDir")
    } finally {
      // restore isolation for the shared context: SparkContext has no
      // public unset, so clear the private field (other suites assert
      // localCheckpoint behavior and must not inherit reliable mode)
      val f = sc.getClass.getDeclaredField("checkpointDir")
      f.setAccessible(true)
      f.set(sc, None)
      assert(sc.getCheckpointDir.isEmpty, "failed to restore checkpoint dir")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckptDir))
    }
  }
}
