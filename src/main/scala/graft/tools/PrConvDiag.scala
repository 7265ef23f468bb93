package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.{functions, SparkSession}

/** Dev-only: where do q_pagerank_conv's per-iteration milliseconds
  * go? Runs the query once (after a substrate warmup) under a
  * listener that aggregates job/stage/task counts and per-stage time,
  * then prints the top stages by total task time vs wall time — the
  * §7.1 empirical loop without a UI.
  */
object PrConvDiag {
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
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the substrate + JIT outside the measured window
    graft.operators.GraphOps.q_pagerank(spark, dir)
      .write.format("noop").mode("overwrite").save()

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var taskTimeMs = 0L
    @volatile var taskRunMs = 0L
    @volatile var taskDeserMs = 0L
    @volatile var taskGcMs = 0L
    val jobSpans = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobWall = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1; jobSpans.put(j.jobId, j.time)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = jobSpans.getOrDefault(j.jobId, j.time)
        jobWall.add(j.time - t0)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          taskRunMs += t.taskMetrics.executorRunTime
          taskDeserMs += t.taskMetrics.executorDeserializeTime
          taskGcMs += t.taskMetrics.jvmGCTime
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        val span = (for {
          t0 <- s.stageInfo.submissionTime
          t1 <- s.stageInfo.completionTime
        } yield t1 - t0).getOrElse(0L)
        taskTimeMs += span
        stageRows.add(f"span=${span}%5d n=${s.stageInfo.numTasks}%3d " +
          s.stageInfo.name.take(70))
      }
    }
    // one manual sub-iteration: what does its AQE-final plan look
    // like (exchange count, join strategies, partitioning reuse)?
    {
      import org.apache.spark.sql.functions._
      val edges = graft.operators.GraphOps.coEdgesEnc(spark, dir)
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val n = deg.count()
      var cur = deg.select(col("src").as("node"),
        lit(1000000000L / n).as("nr"), col("deg"))
        .localCheckpoint()
      for (step <- 1 to 2) {
        val msg = cur.select(col("node").as("src"),
          expr("nr div deg").as("m"))
        val contrib = edges.join(msg.hint("shuffle_hash"), "src")
          .select(col("dst"), col("m").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("sc"))
        val pre = contrib
          .select(col("dst").as("node"),
            expr(s"150000000L div ${n}L + (17L * sc) div 20L").as("nr"))
          .join(cur.select(col("node"), col("nr").as("prev"),
            col("deg")), "node")
        val next = pre.localCheckpoint() // EAGER: does it keep partitioning?
        val d = pre.agg(sum(abs(col("nr") - col("prev"))).as("d"))
        d.collect()
        println(s"=== step $step delta AQE-final plan ===")
        println(d.queryExecution.executedPlan.toString.take(6000))
        cur = next.select("node", "nr", "deg")
      }
    }
    // RDD prototype: partitioner-preserving fixed-point loop — the
    // partitioner survives across iterations (what LogicalRDD loses),
    // so each iteration is exactly ONE co-partitioned narrow join +
    // one reduceByKey shuffle, no Catalyst/AQE per-stage machinery
    {
      import org.apache.spark.HashPartitioner
      val t0 = System.nanoTime()
      val prScale = 1000000000L
      val eDf = graft.operators.GraphOps.coEdgesEnc(spark, dir)
      import spark.implicits._
      val part = new HashPartitioner(
        spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      val e = eDf.select("src", "dst").as[(Long, Long)].rdd
        .partitionBy(part)
      e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val degR = e.mapValues(_ => 1L).reduceByKey(part, _ + _)
      val n = degR.count()
      var rank = degR.mapValues(d => (prScale / n, d))
      rank.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var iters = 0
      var delta = Long.MaxValue
      val theta = prScale / 100L
      val tLoop = System.nanoTime()
      while (iters < 40 && delta >= theta) {
        val msg = rank.mapValues { case (nr, d) => nr / d }
        val contrib = e.join(msg, part)
          .map { case (_, (dst, m)) => (dst, m) }
          .reduceByKey(part, _ + _)
        val next = contrib.join(rank, part)
          .mapValues { case (sc, (prev, d)) =>
            (150000000L / n + (17L * sc) / 20L, prev, d) }
        next.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.localCheckpoint()
        delta = next.map { case (_, (nr, prev, _)) =>
          math.abs(nr - prev) }.sum().toLong
        rank = next.mapValues { case (nr, _, d) => (nr, d) }
        iters += 1
      }
      val top = rank.map { case (node, (nr, d)) => (node, d, nr) }
        .toDF("node", "deg", "nr")
      val rows = top.orderBy(
        (functions.col("nr").cast("double") / prScale).desc,
        functions.col("node")).limit(50).collect()
      println(f"[prconv-rdd] wall=${(System.nanoTime() - t0) / 1e9}%.2fs " +
        f"loop=${(System.nanoTime() - tLoop) / 1e9}%.2fs iters=$iters " +
        s"rows=${rows.length} top=${rows.take(2).mkString(";")}")
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    graft.operators.GraphOps.q_pagerank_conv(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // drain the listener bus
    import scala.jdk.CollectionConverters._
    val jw = jobWall.asScala.toSeq.sorted
    println(f"[prconv] wall=${wall}%.2fs jobs=$jobs stages=$stages " +
      f"tasks=$tasks stageSpanSumMs=$taskTimeMs " +
      f"taskRunMs=$taskRunMs deserMs=$taskDeserMs gcMs=$taskGcMs " +
      s"jobWallMs(sum=${jw.sum}, " +
      s"top=${jw.reverse.take(12).mkString(",")})")
    stageRows.asScala.toSeq.sortBy(r => -r.drop(5).take(5).trim.toLong)
      .take(20).foreach(r => println("[prconv-stage] " + r))
    spark.stop()
  }
}
