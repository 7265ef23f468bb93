package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.{col, count, date_trunc, expr, hour, lit}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational
import graft.streaming.Streams

/** §2.10: streaming results must agree with their batch twins. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = TestSpark.sf0001

  /** Shared two-batch scaffolding: every in-order split test stages
    * single-file parquet batches into a landing dir and cuts the
    * fixture at the event-time median. One definition — a staging
    * change (e.g. multi-part outputs) lands everywhere at once.
    */
  private def stageParquet(d: java.nio.file.Path,
    df: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val tmp = Files.createTempDirectory("stage").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get.toPath
    Files.move(part, d.resolve(name))
  }

  private def tsMedian(ev: org.apache.spark.sql.DataFrame): Double =
    ev.selectExpr("percentile(cast(ts as long), 0.5)")
      .first().getDouble(0)

  /** File stream sources need a directory — stage the single events
    * parquet file into one (the streaming landing-zone layout).
    */
  private lazy val eventsDir: String = {
    val d = Files.createTempDirectory("events_stream")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("windowed streaming counts equal batch q_time_bucket") {
    val q = Streams.windowedCounts(Streams.eventsStream(spark, eventsDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("win_out")
      .select("bucket", "event_type", "cnt", "sum_value")
      .orderBy("bucket", "event_type").collect().toSeq
    val batch = Relational.q_time_bucket(spark, dir).collect().toSeq
    assert(streamed.map(_.toString) == batch.map(_.toString))
  }

  test("sliding streaming windows equal the same window() run in batch") {
    val q = Streams.slidingCounts(Streams.eventsStream(spark, eventsDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("slide_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("slide_out")
      .orderBy("win_start", "event_type").collect().toSeq
    // batch twin: identical sliding-window aggregation over the same
    // parquet — window() is the same Catalyst expansion in both modes
    val batch = Streams.slidingCounts(Tables(spark, dir, "events"))
      .orderBy("win_start", "event_type").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed.map(_.toString) == batch.map(_.toString))
    // every event lands in exactly width/slide = 4 windows
    val evCount = Tables(spark, dir, "events").count()
    assert(streamed.map(_.getLong(2)).sum == evCount * 4)
  }

  test("sliding distinct-user sketch: complete-mode output equals the " +
    "batch run and tracks exact q_sliding_uniques within HLL error") {
    val q = Streams.slidingUniques(Streams.eventsStream(spark, eventsDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("uniq_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("uniq_out")
      .orderBy("win_end").collect().toSeq
    val batch = Streams.slidingUniques(Tables(spark, dir, "events"))
      .orderBy("win_end").collect().toSeq
    assert(streamed.nonEmpty)
    // deterministic sketch hash ⇒ streaming == batch exactly
    assert(streamed.map(_.toString) == batch.map(_.toString))
    // accuracy vs the EXACT batch twin: q_sliding_uniques keys by
    // trailing-window end hour; window.end/3600 - 1 is that hour
    val exact = Relational.q_sliding_uniques(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val approx = streamed.map(r =>
      (r.getTimestamp(0).getTime / 1000 / 3600 - 1, r.getLong(1))).toMap
    val hits = exact.keySet intersect approx.keySet
    assert(hits.size == exact.size,
      "observed-hour windows missing from the streaming sketch")
    hits.foreach { w =>
      val (e, a) = (exact(w).toDouble, approx(w).toDouble)
      assert(math.abs(a - e) / e <= 0.15,
        s"window $w: approx $a vs exact $e beyond HLL tolerance")
    }
  }

  test("streaming session_window sessions equal batch q_sessionize") {
    val q = Streams.sessionCounts(Streams.eventsStream(spark, eventsDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("sess_out")
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start").collect().toSeq
    val batch = Relational.q_sessionize(spark, dir)
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start").collect().toSeq
    assert(streamed.map(_.toString) == batch.map(_.toString))
  }

  test("stateful flatMapGroupsWithState LWW equals batch q_window_dedup_lww") {
    val ck = Files.createTempDirectory("ck_lww").toString
    val q = Streams.statefulLww(spark, Streams.eventsStream(spark, eventsDir))
      .writeStream.outputMode("update")
      .format("memory").queryName("lww_out")
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // final winner per user across all updates = max-ts row
    val streamed = spark.table("lww_out")
      .orderBy($"ts".desc, $"event_id".desc)
      .dropDuplicates("user_id")
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id").collect().toSeq
    val batch = Relational.q_window_dedup_lww(spark, dir).collect().toSeq
    assert(streamed.map(_.toString) == batch.map(_.toString))
  }

  test("streaming retention snapshots converge to batch q_retention " +
    "under out-of-order arrival (late data corrects cohorts)") {
    // two micro-batches, LATER half of the events first: most users'
    // first sighting is a mid-history week, so batch 2 (the earlier
    // half) must LOWER their cohort min and re-emit corrected offsets
    val d = Files.createTempDirectory("events_retention")
    val ev = Tables(spark, dir, "events").select("event_id", "ts",
      "user_id", "event_type", "value")
    val median = tsMedian(ev)
    val lateHalf = ev.filter(col("ts").cast("long") >= median)
    val earlyHalf = ev.filter(col("ts").cast("long") < median)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      stageParquet(d, df, name)
    stage(lateHalf, "batch1.parquet")
    val raw = spark.readStream.schema(ev.schema).parquet(d.toString)
    val ck = Files.createTempDirectory("ck_retention").toString
    val q = Streams.retentionSnapshots(spark, raw)
      .writeStream.outputMode("update")
      .format("memory").queryName("ret_out")
      .option("checkpointLocation", ck)
      .start()
    q.processAllAvailable()
    val afterB1 = spark.table("ret_out").as[Streams.RetentionSnap]
      .collect().groupBy(_.user_id).view.mapValues(_.maxBy(_.rev)).toMap
    stage(earlyHalf, "batch2.parquet")
    q.processAllAvailable()
    q.stop()
    val snaps = spark.table("ret_out").as[Streams.RetentionSnap].collect()
    val finalPerUser = snaps.groupBy(_.user_id).view
      .mapValues(_.maxBy(_.rev)).toMap
    // late data must have actually moved at least one cohort back —
    // otherwise this spec isn't testing the correction path
    val corrected = finalPerUser.count { case (u, s) =>
      afterB1.get(u).exists(_.cohort_day > s.cohort_day)
    }
    assert(corrected > 0, "no cohort was corrected by the early batch")
    // aggregate the final snapshots and compare to the batch oracle
    val streamed = finalPerUser.values.toSeq
      .flatMap(s => s.offsets.map(o => (s.cohort_day, o)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val batch = Relational.q_retention(spark, dir).collect()
      .map(r => ((r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)),
        r.getLong(2))).toMap
    assert(streamed == batch)
    // bounded state: one snapshot row per user, offsets bounded by the
    // fixture's wall-clock span in weeks, not by event count
    val spanWeeks = 1 + (ev.selectExpr(
      "(max(cast(ts as long)) - min(cast(ts as long))) div 604800")
      .first().getLong(0))
    assert(finalPerUser.values.forall(_.offsets.length <= spanWeeks + 1))
  }

  test("foreachBatch LWW parquet sink: upsert semantics + idempotent rerun") {
    val out = Files.createTempDirectory("lww_sink").resolve("state").toString
    val ck1 = Files.createTempDirectory("ck1").toString
    val q1 = Streams.lwwUpsertQuery(spark, eventsDir, out, ck1)
    q1.processAllAvailable(); q1.stop()
    val once = spark.read.parquet(out)
      .select("user_id", "event_id").orderBy("user_id").collect().toSeq
    // re-run from scratch (new checkpoint) — PUT semantics make the
    // sink state identical, like the reference's idempotent re-scrape
    val ck2 = Files.createTempDirectory("ck2").toString
    val q2 = Streams.lwwUpsertQuery(spark, eventsDir, out, ck2)
    q2.processAllAvailable(); q2.stop()
    val twice = spark.read.parquet(out)
      .select("user_id", "event_id").orderBy("user_id").collect().toSeq
    assert(once == twice)
    // and the sink state equals the batch LWW result
    val batch = Relational.q_window_dedup_lww(spark, dir)
      .select("user_id", "event_id").orderBy("user_id").collect().toSeq
    assert(twice.map(_.toString) == batch.map(_.toString))
  }

  test("dropDuplicatesWithinWatermark: redelivered landing files dedup " +
    "to the batch distinct count") {
    // stage the SAME events file twice — the at-least-once redelivery
    // shape (a landing file picked up under two names)
    val d = Files.createTempDirectory("events_dup")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("a.parquet"))
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("b.parquet"))
    val q = Streams.dedupEvents(Streams.eventsStream(spark, d.toString))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("dedup_out").count()
    val batchDistinct = Tables(spark, dir, "events")
      .select("event_id").distinct().count()
    assert(streamed == batchDistinct)
  }

  test("watermark drops late data: an event older than the horizon " +
    "cannot reopen a finalized window") {
    // fresh landing dir so this test controls batch order
    val d = Files.createTempDirectory("events_late")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("a.parquet"))
    val q = Streams.windowedCounts(Streams.eventsStream(spark, d.toString))
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    q.processAllAvailable()
    val emitted = spark.table("late_out").count()
    assert(emitted > 0) // watermark advanced, old windows finalized
    // craft one event 3h older than anything seen — far past the 1h
    // watermark — targeting an already-emitted window
    val maxTsUs = Tables(spark, dir, "events")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.unix_micros(col("ts"))))
      .head().getLong(0)
    val lateRow = spark.range(1).select(
      lit(999999L).as("event_id"),
      org.apache.spark.sql.functions
        .timestamp_micros(lit(maxTsUs - 3L * 3600 * 1000000L))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("ts"),
      lit(1L).as("user_id"), lit("late").as("event_type"),
      lit(1.0).as("value"), lit("{}").as("props"))
    // the file stream source lists plain files — stage the part file
    // itself, not a nested directory
    val staged = Files.createTempDirectory("late_write")
    lateRow.coalesce(1).write.parquet(staged.resolve("w").toString)
    val part = java.nio.file.Files.list(staged.resolve("w")).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.copy(part, d.resolve("b.parquet"))
    q.processAllAvailable(); q.stop()
    // the late event must NOT re-emit (or duplicate) its window
    assert(spark.table("late_out").count() == emitted,
      "late event past the watermark changed finalized output")
  }

  test("stream-stream interval join equals the batch self-join twin") {
    val q = Streams.followupJoin(
      Streams.eventsStream(spark, eventsDir),
      Streams.eventsStream(spark, eventsDir))
      .writeStream.format("memory").queryName("followup_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("followup_out")
      .select("a_event", "b_event").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables(spark, dir, "events").select("event_id", "ts", "user_id")
    val batch = ev.alias("a")
      .join(ev.alias("b"),
        expr("""a.user_id = b.user_id AND b.event_id != a.event_id AND
                b.ts > a.ts AND b.ts <= a.ts + interval 10 minutes"""))
      .select(col("a.event_id"), col("b.event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty) // the fixture must actually exercise the join
  }

  test("stream-stream join drain (q_stream_join) reproduces the batch " +
    "twin under a REAL multi-batch time-sliced drain, pairs matched " +
    "across batch boundaries") {
    val landing = Files.createTempDirectory("followup_slices").toString
    val staged = Streams.sliceEventsByTime(spark,
      s"$dir/events.parquet", landing, slices = 4, filesPerSlice = 2)
    assert(staged >= 4, s"staged only $staged slice files")
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val (outM, evM) = Streams.followupDrain(spark, landing, Some(2))
    val (outS, evS) = Streams.followupDrain(spark, landing, None)
    // a stream-stream join appends one trailing zero-input batch to
    // finalize state at the watermark — count DATA batches
    assert(evM.count(_.numInputRows > 0) >= 3,
      s"sliced join drain ran only ${evM.size} micro-batches")
    assert(evS.count(_.numInputRows > 0) == 1)
    assert(evM.map(_.numInputRows).sum == evS.map(_.numInputRows).sum,
      "sliced batches lost input rows")
    // join buffer state is bounded by the watermark horizon, never
    // cleared to zero mid-stream and never above total event volume
    val events = Tables(spark, dir, "events").count()
    evM.foreach { e =>
      assert(e.stateRowsTotal <= 2 * events,
        s"batch ${e.batchId}: join state ${e.stateRowsTotal} " +
          s"exceeds both stream sides")
    }
    assert(rowsOf(outM) == rowsOf(outS),
      "multi-batch stream-stream join diverges from single-batch")
    // and both equal the declared batch twin exactly
    val batch = operators.Relational.q_join_followup(spark, dir)
    assert(rowsOf(outS) == rowsOf(batch),
      "stream-stream join diverges from the batch self-join twin")
    assert(batch.count() > 0)
  }

  test("foreachBatch KV sink: streamed store equals the batch LWW result " +
    "and re-streaming is idempotent") {
    FakeKv.reset()
    val ck1 = Files.createTempDirectory("ck_kv1").toString
    val q1 = Streams.kvUpsertQuery(spark, eventsDir, ck1, FakeKvFactory)
    q1.processAllAvailable(); q1.stop()
    val batch = Relational.q_window_dedup_lww(spark, dir)
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0).toString -> r.getLong(1).toString).toMap
    assert(FakeKv.store.size() == batch.size)
    batch.foreach { case (uid, eid) =>
      val item = FakeKv.store.get(uid)
      assert(item("event_id") == eid, s"user $uid")
      assert(item("ID") == uid) // reference item shape
    }
    // replay from a fresh checkpoint: PUTs overwrite, state unchanged
    val ck2 = Files.createTempDirectory("ck_kv2").toString
    val q2 = Streams.kvUpsertQuery(spark, eventsDir, ck2, FakeKvFactory)
    q2.processAllAvailable(); q2.stop()
    assert(FakeKv.store.size() == batch.size)
  }

  test("streaming decontamination equals batch q_decontaminate's " +
    "n_hit surface (eval split excluded from the stream)") {
    val docsDir = Files.createTempDirectory("docs_stream")
    Files.copy(java.nio.file.Paths.get(s"$dir/documents.parquet"),
      docsDir.resolve("documents.parquet"))
    // the stream carries only the corpus side — the eval split is the
    // static reference set, not ingest
    val corpus = Streams.docsStream(spark, docsDir.toString)
      .filter(col("doc_id") % 50 =!= 0)
    val q = Streams.decontamHits(corpus,
      graft.operators.TextOps.evalShingles(spark, dir))
      .writeStream.format("memory").queryName("decontam_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("decontam_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = graft.operators.TextOps.q_decontaminate(spark, dir)
      .select("doc_id", "n_hit").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty) // the fixture must actually exercise the probe
  }

  test("streaming frequent items: constant-size MG state across " +
    "micro-batches — exact below k, heavy-item guarantee under eviction") {
    val k = 4
    // synthetic skewed stream, two landing files = two micro-batches.
    // key "hot": 40 distinct light items ×3 + HEAVY ×60 (forces
    // eviction at k=4); key "uniform": 3 items, exact (≤ k distinct)
    val light = (0 until 40).flatMap(i => Seq.fill(3)(s"light$i"))
    val heavy = Seq.fill(60)("HEAVY")
    val hot = (light.grouped(4) zip heavy.grouped(2))
      .flatMap { case (l, h) => l ++ h }.toSeq
    val uniform = Seq.fill(9)("a") ++ Seq.fill(5)("b") ++ Seq.fill(2)("c")
    val all = hot.map("hot" -> _) ++ uniform.map("uniform" -> _)
    val (file1, file2) = all.splitAt(all.size / 2)
    val landing = Files.createTempDirectory("fi_stream")
    Seq(file1 -> "f1", file2 -> "f2").foreach { case (rows, n) =>
      val tmp = Files.createTempDirectory(s"fi_$n").resolve("w").toString
      rows.toDF("key", "item").coalesce(1).write.parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, landing.resolve(s"$n.parquet"))
    }
    val src = spark.readStream
      .schema("key STRING, item STRING")
      .option("maxFilesPerTrigger", 1) // force ≥2 stateful batches
      .parquet(landing.toString)
    val q = Streams.frequentItems(spark, src, k)
      .toDF("key", "n", "items")
      .writeStream.format("memory").queryName("fi_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // max-n emission per key = final state (n is monotone)
    val fin = spark.table("fi_out").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getSeq[org.apache.spark.sql.Row](2)
          .map(x => x.getString(0) -> x.getLong(1))))
      .groupBy(_._1).map { case (kk, rows) => kk -> rows.maxBy(_._2) }
    // uniform: ≤ k distinct ⇒ summary is exact and fully ordered
    val (_, un, uItems) = fin("uniform")
    assert(un == uniform.size)
    assert(uItems == Seq("a" -> 9L, "b" -> 5L, "c" -> 2L))
    // hot: eviction ran, yet the heavy item survives with a counter
    // that is a lower bound within N/(k+1)
    val (_, hn, hItems) = fin("hot")
    assert(hn == hot.size)
    assert(hItems.size <= k)
    val heavyCount = hItems.toMap.get("HEAVY")
    assert(heavyCount.isDefined, s"HEAVY evicted: $hItems")
    assert(heavyCount.get <= 60L)
    assert(60L - heavyCount.get <= hot.size.toLong / (k + 1))
  }

  test("streaming Markov transitions over two in-order batches equal " +
    "batch q_markov's counts, with one state row per user") {
    // per-user in-order contract: a global ts split preserves each
    // user's (ts, event_id) order across the two batches
    val d = Files.createTempDirectory("events_markov")
    val ev = Tables(spark, dir, "events").select("event_id", "ts",
      "user_id", "event_type", "value")
    val median = tsMedian(ev)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      stageParquet(d, df, name)
    stage(ev.filter(col("ts").cast("long") < median), "batch1.parquet")
    val raw = spark.readStream.schema(ev.schema).parquet(d.toString)
    val ck = Files.createTempDirectory("ck_markov").toString
    val q = Streams.markovTransitions(spark, raw)
      .writeStream.outputMode("append")
      .format("memory").queryName("mk_out")
      .option("checkpointLocation", ck)
      .start()
    q.processAllAvailable()
    stage(ev.filter(col("ts").cast("long") >= median), "batch2.parquet")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("mk_out")
      .groupBy("src_type", "dst_type").count()
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val batch = Relational.q_markov(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(streamed == batch)
  }

  test("streaming path trigrams over two in-order batches reproduce " +
    "batch q_paths' top-20 exactly") {
    val d = Files.createTempDirectory("events_paths")
    val ev = Tables(spark, dir, "events").select("event_id", "ts",
      "user_id", "event_type", "value")
    val median = tsMedian(ev)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      stageParquet(d, df, name)
    stage(ev.filter(col("ts").cast("long") < median), "batch1.parquet")
    val raw = spark.readStream.schema(ev.schema).parquet(d.toString)
    val ck = Files.createTempDirectory("ck_paths").toString
    val q = Streams.pathTrigrams(spark, raw)
      .writeStream.outputMode("append")
      .format("memory").queryName("pt_out")
      .option("checkpointLocation", ck)
      .start()
    q.processAllAvailable()
    stage(ev.filter(col("ts").cast("long") >= median), "batch2.parquet")
    q.processAllAvailable()
    q.stop()
    val streamedTop = spark.table("pt_out")
      .groupBy("path").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (p, n) => (-n, p) }.take(20).toSeq
    val batchTop = Relational.q_paths(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(streamedTop == batchTop)
  }

  test("streaming sessionization over two in-order batches reproduces " +
    "batch q_sessionize's full session table, session-spanning splits " +
    "included") {
    val d = Files.createTempDirectory("events_sess")
    val ev = Tables(spark, dir, "events").select("event_id", "ts",
      "user_id", "event_type", "value")
    val median = tsMedian(ev)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      stageParquet(d, df, name)
    // the ts-median split necessarily cuts many users' open sessions
    // across the batch boundary — the re-emission path under test
    stage(ev.filter(col("ts").cast("long") < median), "batch1.parquet")
    val raw = spark.readStream.schema(ev.schema).parquet(d.toString)
    val ck = Files.createTempDirectory("ck_sess").toString
    val q = Streams.sessionSnapshots(spark, raw)
      .writeStream.outputMode("update")
      .format("memory").queryName("ss_out")
      .option("checkpointLocation", ck)
      .start()
    q.processAllAvailable()
    stage(ev.filter(col("ts").cast("long") >= median), "batch2.parquet")
    q.processAllAvailable()
    q.stop()
    // LWW per (user, session): the max-rev snapshot is the closed session
    val streamed = spark.table("ss_out").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(5), r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1)
      .map { case (k, rows) =>
        val (_, st, en, n) = rows.map(_._2).maxBy(_._1)
        k -> (st, en, n)
      }
    val batch = Relational.q_sessionize(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (Math.floorDiv(r.getTimestamp(2).getTime, 1000L),
          Math.floorDiv(r.getTimestamp(3).getTime, 1000L),
          r.getLong(4)))).toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch)
  }

  test("sessionSnapshots counts out-of-order straggler drops in the " +
    "sessionizeDrops accumulator — a violated delivery contract is " +
    "observable, not a silent wrong split") {
    val d = Files.createTempDirectory("events_sess_ooo")
    val ev = Tables(spark, dir, "events").select("event_id", "ts",
      "user_id", "event_type", "value")
    val median = tsMedian(ev)
    // adversarial order: the NEWER half arrives first, so every
    // older-half event of an already-seen user is a straggler
    stageParquet(d, ev.filter(col("ts").cast("long") >= median),
      "batch1.parquet")
    val raw = spark.readStream.schema(ev.schema).parquet(d.toString)
    val ck = Files.createTempDirectory("ck_sess_ooo").toString
    val acc = Streams.sessionizeDrops(spark)
    val before = acc.value
    val q = Streams.sessionSnapshots(spark, raw)
      .writeStream.outputMode("update")
      .format("memory").queryName("ss_ooo_out")
      .option("checkpointLocation", ck)
      .start()
    q.processAllAvailable()
    // batch 1 is in-order within itself (fresh state, sorted in-call)
    val afterClean = acc.value
    stageParquet(d, ev.filter(col("ts").cast("long") < median),
      "batch2.parquet")
    q.processAllAvailable()
    q.stop()
    assert(afterClean == before,
      "a clean in-order batch must not count drops")
    assert(acc.value > before,
      "stragglers must surface as a non-zero drop count")
  }

  private def funnelFinal(snapDf: org.apache.spark.sql.DataFrame)
    : (Long, Long, Long) = {
    val last = snapDf.collect()
      .map(r => (r.getLong(0), (r.getLong(4), r.getLong(1), r.getLong(2),
        r.getLong(3))))
      .groupBy(_._1).map { case (_, rows) => rows.map(_._2).maxBy(_._1) }
    (last.count(_._2 >= 0).toLong, last.count(_._3 >= 0).toLong,
      last.count(_._4 >= 0).toLong)
  }

  private def batchFunnelCounts: (Long, Long, Long) = {
    val rows = Relational.q_funnel(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (rows("1_view"), rows("2_click"), rows("3_purchase"))
  }

  private def runFunnel(first: org.apache.spark.sql.DataFrame,
    second: org.apache.spark.sql.DataFrame, horizonMicros: Long,
    tag: String): (Long, Long, Long) = {
    val d = Files.createTempDirectory(s"events_funnel_$tag")
    stageParquet(d, first, "batch1.parquet")
    val raw = spark.readStream.schema(first.schema).parquet(d.toString)
    val ck = Files.createTempDirectory(s"ck_funnel_$tag").toString
    val q = Streams.funnelStages(spark, raw, horizonMicros)
      .writeStream.outputMode("update")
      .format("memory").queryName(s"funnel_$tag")
      .option("checkpointLocation", ck)
      .start()
    q.processAllAvailable()
    stageParquet(d, second, "batch2.parquet")
    q.processAllAvailable()
    q.stop()
    funnelFinal(spark.table(s"funnel_$tag"))
  }

  test("streaming funnel: exact vs batch q_funnel under an in-order " +
    "split, and exact under ADVERSARIAL disorder while lateness stays " +
    "inside the horizon - the re-qualification buffer works") {
    val ev = Tables(spark, dir, "events").select("event_id", "ts",
      "user_id", "event_type", "value")
    val median = tsMedian(ev)
    val older = ev.filter(col("ts").cast("long") < median)
    val newer = ev.filter(col("ts").cast("long") >= median)
    val batch = batchFunnelCounts
    val drops = Streams.funnelDrops(spark)
    val d0 = drops.value
    assert(runFunnel(older, newer, Streams.funnelHorizonMicros,
      "inorder") == batch, "in-order split diverged from batch")
    // adversarial: the NEWER half arrives first; a horizon wider than
    // the fixture's full time span keeps every straggler inside the
    // buffer, so the result must STILL be exact
    val spanMicros = ev.selectExpr(
      "CAST((max(cast(ts AS DOUBLE)) - min(cast(ts AS DOUBLE))) " +
        "* 1000000 AS BIGINT) AS s").first().getLong(0)
    assert(runFunnel(newer, older, spanMicros + 1000000L,
      "advwide") == batch, "within-horizon disorder changed the stages")
    assert(drops.value == d0, "no event was beyond these horizons")
  }

  test("streaming funnel: an UNDERSIZED horizon under adversarial " +
    "order degrades one-sidedly (never over-counts a stage) and the " +
    "drops are observable in the funnelDrops accumulator") {
    val ev = Tables(spark, dir, "events").select("event_id", "ts",
      "user_id", "event_type", "value")
    val median = tsMedian(ev)
    val older = ev.filter(col("ts").cast("long") < median)
    val newer = ev.filter(col("ts").cast("long") >= median)
    val batch = batchFunnelCounts
    val drops = Streams.funnelDrops(spark)
    val d0 = drops.value
    // one-hour horizon, newest half first: the older half arrives
    // mostly beyond-horizon for every user already seen
    val approx = runFunnel(newer, older, 3600L * 1000000L, "advnarrow")
    assert(drops.value > d0, "stragglers must surface in the counter")
    // processed events are a subset, and v_approx >= v_true makes
    // approx-qualification imply batch-qualification: each stage can
    // only undershoot
    assert(approx._1 <= batch._1 && approx._2 <= batch._2 &&
      approx._3 <= batch._3, s"over-count: $approx vs $batch")
    assert(approx != batch,
      "fixture failed to exercise the divergence (horizon too wide?)")
    info(s"measured divergence at 1h horizon: approx=$approx batch=$batch " +
      s"drops=${drops.value - d0}")
  }

  test("streaming anomaly flags vs a static hour-of-day baseline " +
    "equal the batch recompute; decisions are integer-exact") {
    val ev = Tables(spark, dir, "events")
    // batch-trained baseline: doubled median hourly count per
    // (type, hour-of-day) over the fixture
    val hourly = ev
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("hod", hour(col("h")))
    val baseline = hourly.groupBy("event_type", "hod")
      .agg(expr("CAST(percentile(cnt, 0.5) * 2 AS BIGINT)").as("med2"))
      .as[(String, Int, Long)].collect()
      .map { case (t, hd, m) => (t, hd) -> m }.toMap
    val raw = Streams.eventsStream(spark, eventsDir)
    val ck = Files.createTempDirectory("ck_anom").toString
    val q = Streams.anomalyFlags(spark, raw, baseline)
      .writeStream.outputMode("complete")
      .format("memory").queryName("anom_out")
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("anom_out")
      .as[(java.sql.Timestamp, String, Long, Long, Long)].collect()
      .map(r => (r._1.getTime, r._2) -> (r._3, r._4, r._5)).toMap
    // batch recompute over the same files
    val batch = hourly.as[(String, java.sql.Timestamp, Long, Int)]
      .collect()
    assert(streamed.nonEmpty && batch.nonEmpty)
    assert(streamed.size == batch.length)
    batch.foreach { case (t, h, cnt, hod) =>
      val got = streamed((h.getTime, t))
      val med2 = baseline.getOrElse((t, hod), 0L)
      assert(got._1 == cnt, s"($t,$h) count")
      assert(got._2 == med2, s"($t,$h) baseline")
      assert(got._3 == (if (cnt * 4 > med2 * 3) 1L else 0L),
        s"($t,$h) flag")
    }
  }

  test("anomaly flags under a PARTIAL baseline: unseen (type, hour) " +
    "cells score med2 = NULL and anomalous = NULL (unknown, not " +
    "flagged), covered cells are unaffected") {
    val ev = Tables(spark, dir, "events")
    val hourly = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("hod", hour(col("h")))
    val full = hourly.groupBy("event_type", "hod")
      .agg(expr("CAST(percentile(cnt, 0.5) * 2 AS BIGINT)").as("med2"))
      .as[(String, Int, Long)].collect()
      .map { case (t, hd, m) => (t, hd) -> m }.toMap
    // drop one whole event type from the baseline — the "new event
    // type shipped after training" deployment case
    val dropped = full.keys.map(_._1).toSeq.distinct.sorted.head
    val partial = full.filter { case ((t, _), _) => t != dropped }
    val raw = Streams.eventsStream(spark, eventsDir)
    val ck = Files.createTempDirectory("ck_anom_part").toString
    val q = Streams.anomalyFlags(spark, raw, partial)
      .writeStream.outputMode("complete")
      .format("memory").queryName("anom_part_out")
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("anom_part_out").collect()
    assert(rows.nonEmpty)
    val (unseen, seen) = rows.partition(_.getString(1) == dropped)
    assert(unseen.nonEmpty, "fixture lost the dropped type")
    // unknown cells: explicit NULLs, never a spurious flag
    unseen.foreach { r =>
      assert(r.isNullAt(3), s"med2 not NULL for unseen type: $r")
      assert(r.isNullAt(4), s"anomalous not NULL for unseen type: $r")
    }
    // covered cells keep the integer-exact decision against the
    // trained value for their (type, hour-of-day)
    seen.foreach { r =>
      val (t, cnt) = (r.getString(1), r.getLong(2))
      // UTC hour-of-day from the epoch (session tz is UTC; the JVM
      // default tz must not leak in via toLocalDateTime)
      val hod = (r.getTimestamp(0).getTime / 3600000L % 24L).toInt
      val med2 = r.getLong(3)
      assert(med2 == partial((t, hod)), s"($t,$hod) med2 drifted")
      assert(r.getLong(4) == (if (cnt * 4 > med2 * 3) 1L else 0L))
    }
  }

  test("streaming PSI drift vs a static reference: final emission per " +
    "(window, type) equals a driver-side recompute; state is " +
    "bins-bounded, not volume-bounded") {
    val d = Files.createTempDirectory("events_psi")
    val ev = Tables(spark, dir, "events").select("event_id", "ts",
      "user_id", "event_type", "value")
    val raws = ev.select(col("ts").cast("long"), col("event_type"),
      col("value")).as[(Long, String, Double)].collect()
    val binW = Relational.psiBinWidth
    // reference histogram: the batch q_psi_drift midpoint rule
    val (mn, mx) = (raws.map(_._1).min, raws.map(_._1).max)
    val ref = raws.filter(r => r._1 * 2 <= mn + mx)
      .groupBy(r => (r._2, math.floor(r._3 / binW).toLong))
      .view.mapValues(_.length.toLong).toMap
    // stage two in-order halves
    val median = tsMedian(ev)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      stageParquet(d, df, name)
    stage(ev.filter(col("ts").cast("long") < median), "batch1.parquet")
    val raw = spark.readStream.schema(ev.schema).parquet(d.toString)
    val ck = Files.createTempDirectory("ck_psi").toString
    val winSecs = 21600L
    val q = Streams.psiDrift(spark, raw, ref, winSecs)
      .writeStream.outputMode("append")
      .format("memory").queryName("psi_out")
      .option("checkpointLocation", ck)
      .start()
    q.processAllAvailable()
    stage(ev.filter(col("ts").cast("long") >= median), "batch2.parquet")
    q.processAllAvailable()
    q.stop()
    val emissions = spark.table("psi_out")
      .as[(Long, String, Long, Long, Double)].collect()
    assert(emissions.nonEmpty)
    // final emission per key = the one with the key's max n_cur
    // (counts only grow; a key untouched by batch 2 keeps its batch-1
    // reading)
    val fin = emissions.groupBy(e => (e._1, e._2))
      .view.mapValues(_.maxBy(_._3)).toMap
    // driver-side recompute over the full corpus
    val byKey = raws.groupBy(r => (r._1 / winSecs * winSecs, r._2))
    assert(fin.keySet == byKey.keySet)
    byKey.foreach { case (key, rows) =>
      val cur = rows.groupBy(r => math.floor(r._3 / binW).toLong)
        .view.mapValues(_.length.toLong).toMap
      val refT = ref.collect { case ((t, b), c) if t == key._2 => b -> c }
      val all = (refT.keySet ++ cur.keySet).toSeq.sorted
      val k = all.size
      val (nR, nC) = (refT.values.sum, cur.values.sum)
      val psi = all.map { b =>
        val p = (refT.getOrElse(b, 0L) + 1).toDouble / (nR + k)
        val qq = (cur.getOrElse(b, 0L) + 1).toDouble / (nC + k)
        BigDecimal((p - qq) * math.log(p / qq))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      val got = fin(key)
      assert(got._3 == nC, s"$key n_cur")
      assert(got._4 == k.toLong, s"$key n_bins")
      assert(math.abs(got._5 - psi) < 1e-9, s"$key psi ${got._5} vs $psi")
      // bounded state: bins, not events — the whole point of the shape
      assert(k <= 16, s"$key state grew past the bin bound")
    }
  }

  test("streaming as-of enrichment over two in-order batches equals " +
    "batch q_join_asof — cross-batch matches ride the per-user state") {
    val d = Files.createTempDirectory("events_asof")
    val ev = Tables(spark, dir, "events").select("event_id", "ts",
      "user_id", "event_type", "value")
    val median = tsMedian(ev)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      stageParquet(d, df, name)
    stage(ev.filter(col("ts").cast("long") < median), "batch1.parquet")
    val raw = spark.readStream.schema(ev.schema).parquet(d.toString)
    val ck = Files.createTempDirectory("ck_asof").toString
    val q = Streams.asofEnrich(spark, raw)
      .writeStream.outputMode("append")
      .format("memory").queryName("ao_out")
      .option("checkpointLocation", ck)
      .start()
    q.processAllAvailable()
    stage(ev.filter(col("ts").cast("long") >= median), "batch2.parquet")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ao_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val batch = graft.operators.AsOfJoin.q_join_asof(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
    // the split must actually exercise cross-batch state: at least
    // one batch-2 error matches a batch-1 purchase
    val purch1 = ev.filter(col("event_type") === "purchase" &&
      col("ts").cast("long") < median)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val err2 = ev.filter(col("event_type") === "error" &&
      col("ts").cast("long") >= median)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(streamed.exists { case (e, p) => err2(e) && purch1(p) },
      "split produced no cross-batch match — the state path went untested")
  }

  test("streaming top-k over two micro-batches converges to the batch " +
    "ranking head, with state bounded at k tuples per type") {
    val d = Files.createTempDirectory("events_topk")
    val ev = Tables(spark, dir, "events").select("event_id", "ts",
      "user_id", "event_type", "value")
    val median = tsMedian(ev)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      stageParquet(d, df, name)
    stage(ev.filter(col("ts").cast("long") < median), "batch1.parquet")
    val raw = spark.readStream.schema(ev.schema).parquet(d.toString)
    val ck = Files.createTempDirectory("ck_topk").toString
    val q = Streams.topkPerType(spark, raw)
      .writeStream.outputMode("update")
      .format("memory").queryName("tk_out")
      .option("checkpointLocation", ck)
      .start()
    q.processAllAvailable()
    stage(ev.filter(col("ts").cast("long") >= median), "batch2.parquet")
    q.processAllAvailable()
    q.stop()
    // final emission per type = the max-count row (the declared rule)
    val fin = spark.table("tk_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[org.apache.spark.sql.Row](2)
        .map(p => (p.getDouble(0), p.getLong(1)))))
      .groupBy(_._1).view.mapValues(_.maxBy(_._2)._3).toMap
    // batch truth: global (value desc, event_id asc) head per type
    val truth = ev.select("event_type", "value", "event_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.toSeq
        .sortBy(t => (-t._2, t._3)).take(Streams.streamTopK)
        .map(t => (t._2, t._3))).toMap
    assert(fin.keySet == truth.keySet)
    fin.foreach { case (et, top) =>
      assert(top.length <= Streams.streamTopK)
      assert(top == truth(et), s"$et: $top vs ${truth(et)}")
    }
  }

  test("streaming count-min sketch over two micro-batches equals the " +
    "batch sketch over the same rows (cellwise mergeability), with " +
    "state bounded by the d x 256 geometry") {
    val d = Files.createTempDirectory("events_cms")
    val ev = Tables(spark, dir, "events").select("event_id", "ts",
      "user_id", "event_type", "value")
    val median = tsMedian(ev)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      stageParquet(d, df, name)
    stage(ev.filter(col("ts").cast("long") < median), "batch1.parquet")
    val raw = spark.readStream.schema(ev.schema).parquet(d.toString)
    val ck = Files.createTempDirectory("ck_cms").toString
    val q = Streams.cmsCounters(raw)
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_out")
      .option("checkpointLocation", ck)
      .start()
    q.processAllAvailable()
    stage(ev.filter(col("ts").cast("long") >= median), "batch2.parquet")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cms_out").collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val batch = Streams.cmsCounters(ev).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(streamed == batch,
      "streamed counters diverge from the batch sketch")
    // state bound: at most d x 256 counter cells, ever
    assert(streamed.size <= graft.operators.TextOps.cmsDepth * 256)
    // each of the d rows accounts for every event exactly once
    val evCount = ev.count()
    (0 until graft.operators.TextOps.cmsDepth).foreach { i =>
      assert(streamed.collect { case ((r, _), c) if r == i => c }.sum
        == evCount, s"row $i does not partition the stream")
    }
  }

  test("q_stream_psi equals batch q_psi_drift end-to-end, and the " +
    "histogram machine is exact under FULL cross-batch disorder " +
    "(commutative fold — no delivery contract needed)") {
    // 1. drained twin == batch query, row for row
    val got = Streams.q_stream_psi(spark, dir).collect().map(_.toString).toSeq
    val want = Relational.q_psi_drift(spark, dir).collect()
      .map(_.toString).toSeq
    assert(got.nonEmpty && got == want)
    // 2. adversarial staging: the LATER half of the corpus arrives as
    // batch 1, the earlier half as batch 2 — unlike the in-order
    // twins, histogram accumulation is a commutative fold, so the
    // final snapshots must STILL equal the direct batch histogram
    val ev = Tables(spark, dir, "events").select("event_id", "ts",
      "user_id", "event_type", "value")
    val b = ev.selectExpr("min(cast(ts as long)) as mn",
      "max(cast(ts as long)) as mx").collect()(0)
    val boundary2 = b.getLong(0) + b.getLong(1)
    // split INSIDE the current half (the overall median coincides with
    // the reference/current boundary, which would leave batch 2 with
    // no current events): the newest quarter arrives FIRST
    val median = tsMedian(
      ev.filter(col("ts").cast("long") * 2 > boundary2))
    val d = Files.createTempDirectory("events_psi")
    stageParquet(d, ev.filter(col("ts").cast("long") >= median),
      "batch1.parquet")
    val raw = spark.readStream.schema(ev.schema).parquet(d.toString)
    val ck = Files.createTempDirectory("ck_psi").toString
    val q = Streams.currentHistSnapshots(spark, raw, boundary2)
      .writeStream.outputMode("update")
      .format("memory").queryName("psi_out")
      .option("checkpointLocation", ck)
      .start()
    q.processAllAvailable()
    stageParquet(d, ev.filter(col("ts").cast("long") < median),
      "batch2.parquet")
    q.processAllAvailable()
    q.stop()
    val snaps = spark.table("psi_out").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getMap[Long, Long](2).toMap))
    assert(snaps.map(_._2).max > 1, "disorder split produced one batch " +
      "per key — the cross-batch accumulation path went untested")
    val last = snaps.groupBy(_._1).map { case (t, xs) =>
      t -> xs.maxBy(_._2)._3 }
    val direct = ev
      .filter(col("ts").cast("long") * 2 > boundary2)
      .groupBy(col("event_type"),
        org.apache.spark.sql.functions.floor(col("value") /
          Relational.psiBinWidth).cast("long").as("bin"))
      .count().collect()
      .groupBy(_.getString(0)).map { case (t, rows) =>
        t -> rows.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    assert(last == direct,
      s"disordered snapshots diverge from the batch histogram")
  }

  test("multi-batch time-sliced drains (asof/lww/sessionize) execute " +
    "real multiple micro-batches with bounded per-batch state and " +
    "reproduce the single-batch result exactly") {
    val landing = Files.createTempDirectory("slices_spec").toString
    val staged = Streams.sliceEventsByTime(spark,
      s"$dir/events.parquet", landing, slices = 4, filesPerSlice = 2)
    assert(staged >= 4, s"staged only $staged slice files")
    val users = Tables(spark, dir, "events")
      .select("user_id").distinct().count()
    // the drop accumulator is context-cumulative (the straggler spec
    // above feeds it on purpose) — assert THIS test's delta, not the
    // absolute value
    val drops0 = Streams.sessionizeDrops(spark).value
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val drains = Seq[(String,
      Option[Int] => (org.apache.spark.sql.DataFrame,
        Seq[Streams.BatchEvidence]))](
      ("asof", Streams.asofDrain(spark, landing, _)),
      ("lww", Streams.lwwDrain(spark, landing, _)),
      ("sessionize", Streams.sessionizeDrain(spark, landing, _)))
    drains.foreach { case (name, d) =>
      val (outM, evM) = d(Some(2))
      val (outS, evS) = d(None)
      assert(evM.size >= 3,
        s"$name: sliced drain ran only ${evM.size} micro-batches")
      assert(evS.size == 1,
        s"$name: unsliced drain split into ${evS.size} batches")
      // state is bounded by the user universe, never event volume,
      // in EVERY batch — the StateBoundSpec discipline per batch
      evM.foreach { e =>
        assert(e.stateRowsTotal <= users,
          s"$name batch ${e.batchId}: state ${e.stateRowsTotal} > $users users")
      }
      assert(evM.map(_.numInputRows).sum == evS.head.numInputRows,
        s"$name: sliced batches lost input rows")
      assert(rowsOf(outM) == rowsOf(outS),
        s"$name: multi-batch result diverges from single-batch")
    }
    // time-sliced delivery respected the per-user order contract
    assert(Streams.sessionizeDrops(spark).value == drops0,
      "sessionize dropped stragglers under time-sliced delivery")
  }

  test("streaming content-hash dedup equals batch q_text_dedup under " +
    "a fully UNORDERED multi-file drain, with state bounded by " +
    "distinct content") {
    // no delivery contract to respect (min/count commute), so the
    // landing slices are deliberately arbitrary: hash-partitioned
    // parts, each written as its own landing file
    val docs = Tables(spark, dir, "documents")
    val landing = Files.createTempDirectory("dedup_stream")
    (0 until 4).foreach { k =>
      stageParquet(landing,
        docs.filter(col("doc_id") % 4 === k)
          .select("doc_id", "text", "lang", "source", "n_chars"),
        f"part$k%02d.parquet")
    }
    val (outM, evM) = Streams.dedupDrain(spark, landing.toString, Some(1))
    val (outS, evS) = Streams.dedupDrain(spark, landing.toString, None)
    assert(evM.size >= 3,
      s"sliced dedup drain ran only ${evM.size} micro-batches")
    assert(evS.size == 1)
    val distinctHashes = docs
      .select(org.apache.spark.sql.functions.md5(col("text")))
      .distinct().count()
    evM.foreach { e =>
      assert(e.stateRowsTotal <= distinctHashes,
        s"batch ${e.batchId}: state ${e.stateRowsTotal} > $distinctHashes")
    }
    val rowsM = outM.collect().map(_.toSeq).toSeq
    assert(rowsM == outS.collect().map(_.toSeq).toSeq,
      "multi-batch dedup diverges from single-batch")
    val batch = graft.operators.TextOps.q_text_dedup(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(rowsM == batch, "streaming dedup diverges from batch twin")
  }
}
