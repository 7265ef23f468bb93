package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: dHash band-bucket size distribution at a given SF
  * (the LSH skew question — a low-entropy bucket of size m yields
  * m²/2 candidate pairs).
  */
object DhashDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.operators.MultimodalOps.dhashBandedForDiag(spark, sfDir)
    val sizes = df.groupBy("band", "key").count()
    sizes.orderBy(col("count").desc).limit(10).collect()
      .foreach(r => println(s"[diag] band=${r.getInt(0)} key=${r.getLong(1)} n=${r.getLong(2)}"))
    val stats = sizes.agg(count(lit(1)), sum(col("count") * (col("count") - 1) / 2)).collect()(0)
    println(s"[diag] buckets=${stats.get(0)} totalCandPairs=${stats.get(1)}")
    spark.stop()
  }
}
