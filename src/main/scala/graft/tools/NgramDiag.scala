package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scaling diagnostic for q_dedup_ngram: counts the stage
  * cardinalities (shingle rows, distinct shingles, rare-kept rows,
  * candidate pair rows = sum C(df,2)) at a given SF dir, so a
  * super-linear bench time can be attributed to either data shape
  * (pair fan-out growing faster than the corpus) or execution
  * (spill/partition sizing).
  */
object NgramDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sh = graft.operators.TextOps.docShingles(spark, dir)
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val cap = graft.operators.TextOps.maxShingleDf
    val agg = df.agg(
      count(lit(1)).as("distinct_shingles"),
      sum(col("df")).as("shingle_rows"),
      sum(when(col("df") <= cap, col("df")).otherwise(0)).as("rare_rows"),
      sum(when(col("df") <= cap, col("df") * (col("df") - 1) / 2)
        .otherwise(0)).as("cand_pairs"),
      max(col("df")).as("max_df")).collect()(0)
    println(s"[diag] $dir distinct=${agg.get(0)} rows=${agg.get(1)} " +
      s"rare=${agg.get(2)} pairs=${agg.get(3)} maxdf=${agg.get(4)}")
    spark.stop()
  }
}
