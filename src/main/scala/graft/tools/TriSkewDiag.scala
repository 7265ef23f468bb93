package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: is q_triangles' wedge join skewed? (r10 verdict item 6.)
  * Prints the ORIENTED out-degree histogram of the minhash candidate
  * pair graph — the wedge join fans out as Σ outdeg², so the answer
  * is the max/median outdeg ratio and the top-outdeg share of wedge
  * rows, plus the same for the RAW (unoriented) degree for contrast
  * (the degree-orientation is the load-bearing trick; this quantifies
  * what it already buys).
  */
object TriSkewDiag {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    val edges = graft.operators.TextOps.minhashCandidatePairs(spark, dir)
    val deg = edges.select(col("a_id").as("node"))
      .union(edges.select(col("b_id").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val da = deg.select(col("node").as("a_id"), col("deg").as("a_deg"))
    val db = deg.select(col("node").as("b_id"), col("deg").as("b_deg"))
    val aFirst = col("a_deg") < col("b_deg") ||
      (col("a_deg") === col("b_deg") && col("a_id") < col("b_id"))
    val o = edges.join(da, "a_id").join(db, "b_id")
      .select(when(aFirst, col("a_id")).otherwise(col("b_id")).as("src"))
    val outdeg = o.groupBy("src").agg(count(lit(1)).as("od"))
    def stats(d: org.apache.spark.sql.DataFrame, c: String, tag: String)
      : Unit = {
      val r = d.agg(
        count(lit(1)).as("n"),
        max(col(c)).as("mx"),
        expr(s"percentile($c, 0.5)").as("med"),
        sum(col(c) * col(c)).as("sumsq"),
        max(col(c) * col(c)).as("maxsq")).collect()(0)
      val n = r.getLong(0); val mx = r.getLong(1); val med = r.getDouble(2)
      val sumsq = r.getLong(3); val maxsq = r.getLong(4)
      println(f"[triskew] $tag nodes=$n max=$mx med=$med%.1f " +
        f"max/med=${mx / math.max(med, 1.0)}%.1f wedgeRows=$sumsq " +
        f"topNodeShare=${maxsq.toDouble / math.max(sumsq, 1L)}%.4f")
    }
    println(s"[triskew] pairs=${edges.count()}")
    stats(outdeg, "od", "oriented")
    stats(deg, "deg", "raw     ")
    spark.stop()
  }
}
