package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: where do q_vec_cov's seconds go? (r11: the cold-pass
  * protocol exposed covCells at ~7 s standalone for 2000×64 floats —
  * ~1000× off the compute floor.) Times the moment-matrix shapes:
  *   A current: nested interpreted lambdas building 2080
  *     struct(i,j,decimal) per vector, explode, hash-agg;
  *   B same lambdas but the array pre-cast to DECIMAL once per vector
  *     (the inner lambda re-cast vi/vj per PAIR — 8.3M casts);
  *   C codegen self-join: posexplode once (128k rows), equi-join on
  *     vec_id with pos≤pos, product+agg in whole-stage codegen;
  *   D as A but DOUBLE products — how much of A is decimal cost.
  * A/B/C must produce IDENTICAL spp/n/si/sj cells (asserted).
  */
object CovDiag {
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
    val e = graft.Tables(spark, dir, "embeddings")
    def timeIt(tag: String, df: => DataFrame): DataFrame = {
      var out: DataFrame = null
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        out = df
        out.write.format("noop").mode("overwrite").save()
        println(f"[cov] $tag run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      out
    }
    val a = timeIt("A_current", {
      e.select(expr(
        """explode(flatten(transform(embedding, (vi, i) ->
          |  transform(slice(embedding, i + 1, size(embedding) - i), (vj, k) ->
          |    struct(CAST(i AS BIGINT) AS i, CAST(i + k AS BIGINT) AS j,
          |      CAST(CAST(CAST(vi AS DOUBLE) AS DECIMAL(20,8))
          |        * CAST(CAST(vj AS DOUBLE) AS DECIMAL(20,8))
          |        AS DECIMAL(38,16)) AS p)))))""".stripMargin).as("c"))
        .select(col("c.i").as("i"), col("c.j").as("j"), col("c.p").as("p"))
        .groupBy("i", "j")
        .agg(sum(col("p")).as("spp"), count(lit(1)).as("n"))
    })
    val b = timeIt("B_precast", {
      e.select(expr(
        "transform(embedding, v -> CAST(CAST(v AS DOUBLE) AS DECIMAL(20,8)))")
        .as("d"))
        .select(expr(
          """explode(flatten(transform(d, (vi, i) ->
            |  transform(slice(d, i + 1, size(d) - i), (vj, k) ->
            |    struct(CAST(i AS BIGINT) AS i, CAST(i + k AS BIGINT) AS j,
            |      CAST(vi * vj AS DECIMAL(38,16)) AS p)))))""".stripMargin)
          .as("c"))
        .select(col("c.i").as("i"), col("c.j").as("j"), col("c.p").as("p"))
        .groupBy("i", "j")
        .agg(sum(col("p")).as("spp"), count(lit(1)).as("n"))
    })
    val c = timeIt("C_selfjoin", {
      val flat = e.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          col("x").cast("double").cast("decimal(20,8)").as("v"))
      flat.as("a").join(flat.as("b"), Seq("vec_id"))
        .filter(col("a.pos") <= col("b.pos"))
        .select(col("a.pos").as("i"), col("b.pos").as("j"),
          (col("a.v") * col("b.v")).cast("decimal(38,16)").as("p"))
        .groupBy("i", "j")
        .agg(sum(col("p")).as("spp"), count(lit(1)).as("n"))
    })
    timeIt("D_double", {
      e.select(expr(
        """explode(flatten(transform(embedding, (vi, i) ->
          |  transform(slice(embedding, i + 1, size(embedding) - i), (vj, k) ->
          |    struct(CAST(i AS BIGINT) AS i, CAST(i + k AS BIGINT) AS j,
          |      CAST(vi AS DOUBLE) * CAST(vj AS DOUBLE) AS p)))))""".stripMargin)
        .as("c"))
        .select(col("c.i").as("i"), col("c.j").as("j"), col("c.p").as("p"))
        .groupBy("i", "j")
        .agg(sum(col("p")).as("spp"), count(lit(1)).as("n"))
    })
    val eFlat = timeIt("E_flatarr", {
      // flat product array (no per-pair struct); (i,j) recovered from
      // the flat position via a broadcast 2080-row lookup generated
      // from the same upper-triangle walk
      val d = 64
      val lut = spark.range(0, d.toLong).select(col("id").as("i"))
        .select(col("i"), explode(expr(s"sequence(i, ${d - 1})")).as("j"))
        .select(
          (col("i") * d - col("i") * (col("i") - 1) / 2
            + col("j") - col("i")).as("pos"),
          col("i"), col("j"))
      e.select(expr(
        "transform(embedding, v -> CAST(CAST(v AS DOUBLE) AS DECIMAL(20,8)))")
        .as("d"))
        .select(posexplode(expr(
          """flatten(transform(d, (vi, i) ->
            |  transform(slice(d, i + 1, size(d) - i), vj ->
            |    CAST(vi * vj AS DECIMAL(38,16)))))""".stripMargin))
          .as(Seq("pos", "p")))
        .groupBy(col("pos").cast("long").as("pos"))
        .agg(sum(col("p")).as("spp"), count(lit(1)).as("n"))
        .join(broadcast(lut), "pos")
        .select("i", "j", "spp", "n")
    })
    // value parity (cell-by-cell, exact decimals)
    def rows(df: DataFrame) = df.orderBy("i", "j").collect().toSeq
    val (ra, rb, rc) = (rows(a), rows(b), rows(c))
    val re = rows(eFlat.select("i", "j", "spp", "n"))
    println(s"[cov] A==B: ${ra == rb}  A==C: ${ra == rc}  " +
      s"A==E: ${ra.map(_.toSeq) == re.map(_.toSeq)}  cells=${ra.size}")
    spark.stop()
  }
}
