package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev profiler: time + formatted plan for one declared query.
  * Usage: runMain graft.tools.ProfileMain <query> [sfDir] [explain]
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(q)(spark, dir)
    if (args.length > 2 && args(2) == "explain") df.explain("formatted")
    (1 to 5).foreach { i =>
      val t0 = System.nanoTime()
      // noop write = full evaluation, same meter as Bench (a count
      // would let Catalyst prune the very columns being profiled)
      df.write.format("noop").mode("overwrite").save()
      println(f"[profile] $q run$i time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
