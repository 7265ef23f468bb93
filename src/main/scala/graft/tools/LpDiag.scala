package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Diagnostic: per-round label-churn profile of the co-purchase LPA —
  * how many nodes change label in each synchronous round, and how
  * many nodes the next round's restricted re-vote would touch. This
  * is the sizing fact the delta-propagation decision stands on (the
  * r7 measurement: 100% churn at every round and scale — bipartite
  * oscillation — so the frontier form was rejected for q_label_prop).
  * Runs on the SHIPPED substrate and vote body (GraphOps.coEdgesEnc +
  * GraphOps.lpVote) so the timings describe the production path and
  * cannot drift from it. Args: sfDir, [iters].
  */
object LpDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = GraphOps.coEdgesEnc(spark, sfDir)
    val nE = e.count()
    val nV = e.select("src").distinct().count()
    System.err.println(s"[lpdiag] |E|=$nE |V|=$nV")
    var prev = e.groupBy(col("dst").as("node"))
      .agg(min(col("src")).as("lbl")).localCheckpoint()
    for (r <- 2 to iters) {
      val t0 = System.nanoTime()
      val lbl = GraphOps.lpVote(e, prev).localCheckpoint()
      val changed = lbl.join(prev.withColumnRenamed("lbl", "plbl"), "node")
        .filter(col("lbl") =!= col("plbl")).select(col("node").as("src"))
        .localCheckpoint()
      val nChanged = changed.count()
      val affected = e.join(changed, "src").select("dst").distinct()
      val nAffected = affected.count()
      val nEdgesIn = e.join(affected, "dst").count()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[lpdiag] round $r: full-vote ${dt}%.1fs; " +
        f"changed=$nChanged (${100.0 * nChanged / nV}%.1f%% of V), " +
        f"next-round affected=$nAffected (${100.0 * nAffected / nV}%.1f%%), " +
        f"edges-into-affected=$nEdgesIn (${100.0 * nEdgesIn / nE}%.1f%% of E)")
      prev = lbl
    }
    spark.stop()
  }
}
