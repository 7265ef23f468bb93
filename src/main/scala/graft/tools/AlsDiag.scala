package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: time q_als's building blocks one at a time (the sf10
  * spot burned 700 CPU-seconds per task inside a keyed decimal hash
  * aggregate — find which block and why).
  */
object AlsDiag {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/dev/shm/sf10"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[alsdiag] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val rat = graft.Caches.cached(
      graft.operators.Recommender.alsRatings(spark, dir))
    timed("ratings_fill")(rat.count())
    timed("ratings_recount")(rat.count())
    val v0 = rat.select("b").distinct()
      .select(col("b"), lit(graft.operators.Recommender.alsScale).as("v"))
    // usweep formulations: decimal vs long sums
    val uDec = rat.join(broadcast(v0), "b")
      .groupBy("c")
      .agg(
        sum(col("r").cast("decimal(38,0)") * col("v").cast("decimal(38,0)"))
          .as("srv"),
        sum(col("v").cast("decimal(38,0)") * col("v").cast("decimal(38,0)"))
          .as("svv"))
      .selectExpr("c", "CAST(srv * 1000000L * 1000000L div svv AS BIGINT) AS u")
    timed("usweep_decimal")(uDec.write.format("noop").mode("overwrite").save())
    val uLong = rat.join(broadcast(v0), "b")
      .groupBy("c")
      .agg(sum(col("r") * col("v")).as("srv"),
        sum(col("v") * col("v")).as("svv"))
      .selectExpr("c",
        "CAST(CAST(srv AS DECIMAL(38,0)) * 1000000L * 1000000L div svv AS BIGINT) AS u")
    timed("usweep_long")(uLong.write.format("noop").mode("overwrite").save())
    // group count
    timed("distinct_c")(System.err.println("c=" +
      rat.select("c").distinct().count()))
    spark.stop()
  }
}
