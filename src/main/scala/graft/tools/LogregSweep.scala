package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev sweep for q_logreg's training geometry: collects the (tiny)
  * fixture design matrix once and tries (eta, steps) combinations
  * driver-side, printing boundary accuracy + loss so the declared
  * constants are measured, not guessed. Plain doubles here — the
  * decimal grid changes weights at the 12th dp, irrelevant to
  * geometry choice.
  */
object LogregSweep {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.operators.TextOps.logregFeatures(spark, dir)
      .collect()
      .map(r => (r.getDouble(0),
        Array(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
    val d = 4
    val base = rows.count(_._1 == 1.0).toDouble / rows.length
    println(s"[sweep] n=${rows.length} en_rate=$base")
    for (eta <- Seq(1.0, 2.0, 4.0, 8.0, 16.0); k <- Seq(10, 20, 50, 100)) {
      var w = graft.operators.TextOps.logregInit(d).map(_.doubleValue).toArray
      for (_ <- 1 to k) {
        val g = new Array[Double](d)
        rows.foreach { case (y, x) =>
          val m = (0 until d).map(j => x(j) * w(j)).sum
          val s = 1.0 / (1.0 + math.exp(-m))
          for (j <- 0 until d) g(j) += (s - y) * x(j)
        }
        for (j <- 0 until d) w(j) -= eta * g(j) / rows.length
      }
      val acc = rows.count { case (y, x) =>
        ((0 until d).map(j => x(j) * w(j)).sum >= 0) == (y == 1.0)
      }.toDouble / rows.length
      val loss = rows.map { case (y, x) =>
        val s = 1.0 / (1.0 + math.exp(-(0 until d).map(j => x(j) * w(j)).sum))
        -(y * math.log(math.max(s, 1e-15)) +
          (1 - y) * math.log(math.max(1 - s, 1e-15)))
      }.sum / rows.length
      println(f"[sweep] eta=$eta%5.1f k=$k%3d acc=$acc%.4f loss=$loss%.4f " +
        s"w=${w.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
