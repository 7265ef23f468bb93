package graft.tools

import org.apache.spark.sql.SparkSession

/** VERDICT r9 item 5: does a per-direction SPLIT substrate beat the
  * mixed substrate's filtered scans for q_hits? Runs both variants
  * over the same data dir, two timed passes each (run1 of the mixed
  * variant includes the shared-substrate CTAS; run1 of the split
  * variant includes the split CTAS), prints one JSON line per run.
  * The split tables are derived from the mixed substrate, so the
  * mixed variant runs FIRST and the split CTAS cost is visible on
  * its own run1. Keep-only-if-measured: q_hits switches to the split
  * only if min-of-2 steady-state wins here at BOTH sf10 and sf100.
  *
  * Args: sfDir. Env: SPARK_GRAFT_CPUS / SPARK_GRAFT_SHUFFLE /
  * SPARK_GRAFT_LOCAL_DIR / SPARK_GRAFT_CACHE_MODE like SpotBench.
  */
object HitsSplitDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val localDir =
      sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark")
    val cacheMode = sys.env.getOrElse("SPARK_GRAFT_CACHE_MODE", "persist")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", localDir)
      .config(graft.Caches.modeKey, cacheMode)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def timeIt(tag: String, run: Int)(f: => org.apache.spark.sql.DataFrame)
      : Unit = {
      graft.Caches.releaseAll()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"metric":"hits_split","variant":"$tag","run":$run,""" +
        s""""sf":"$sfDir","sec":${fmt(sec)}}""")
    }
    for (r <- 1 to 2)
      timeIt("mixed", r)(graft.operators.GraphOps.q_hits(spark, sfDir))
    for (r <- 1 to 2)
      timeIt("split", r)(graft.operators.GraphOps.q_hits_split(spark, sfDir))
    // contract check: identical output
    val a = graft.operators.GraphOps.q_hits(spark, sfDir).collect().toSeq
    val b = graft.operators.GraphOps.q_hits_split(spark, sfDir).collect().toSeq
    println(s"""{"metric":"hits_split","check":"outputs_equal","ok":${a == b}}""")
    spark.stop()
  }
}
