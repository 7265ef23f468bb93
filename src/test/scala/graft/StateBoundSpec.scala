package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams

/** Sustained-input state bounds for the round-3 streaming state
  * machines (SURVEY §2.10). The batch-twin specs prove the VALUES are
  * right; these prove the STATE STORE stays bounded when the stream
  * runs 10×+ past the state machine's nominal capacity — the property
  * that decides whether the query survives week-long uptime, read
  * straight from the engine's own stateOperators metrics rather than
  * asserted in prose.
  */
class StateBoundSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Latest non-empty state metric across recent progress events
    * (the final trigger can be a no-data heartbeat with no operator
    * entry, so scan backwards).
    */
  private def stateRows(q: StreamingQuery): Long =
    q.recentProgress.reverse.iterator
      .map(_.stateOperators.map(_.numRowsTotal).sum)
      .find(_ > 0).getOrElse(0L)

  test("frequentItems state stays one row per KEY while the item " +
    "vocabulary grows 100x past the summary width") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val k = 8
    val in = MemoryStream[(String, String)]
    val rows = in.toDF().toDF("key", "item")
    val q = Streams.frequentItems(spark, rows, k)
      .toDF("key", "n", "summary")
      .writeStream.format("memory").queryName("freq_state")
      .outputMode("update").start()
    try {
      val batches = 20
      val freshPerBatch = 40 // 40 NEW items/key/batch: 800 distinct >> k
      for (b <- 0 until batches) {
        val data = for {
          key <- Seq("k1", "k2")
          i <- 0 until freshPerBatch
        } yield (key, s"item_${key}_${b}_$i")
        in.addData(data ++ Seq(("k1", "HEAVY"), ("k2", "HEAVY")): _*)
        q.processAllAvailable()
        // the invariant that makes an unbounded stream survivable:
        // state rows = #groups, NEVER #distinct-items-seen
        assert(stateRows(q) == 2,
          s"batch $b: state grew to ${stateRows(q)} rows (expected 2)")
      }
      // and each group's summary is still ≤ k counters after 10×k
      // distinct items per batch forced eviction every micro-batch
      val last = spark.table("freq_state")
        .groupBy("key").agg(org.apache.spark.sql.functions.max("n").as("n"))
        .count()
      assert(last == 2)
      val sizes = spark.table("freq_state")
        .select(org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.col("summary")))
        .collect().map(_.getInt(0))
      assert(sizes.forall(_ <= k),
        s"summary exceeded k=$k counters: ${sizes.max}")
    } finally q.stop()
  }

  test("interval-join state expires with the watermark instead of " +
    "buffering the whole stream") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Timestamp, Long)]
    val events = in.toDF().toDF("event_id", "ts", "user_id")
    val q = Streams.followupJoin(events, events)
      .writeStream.format("memory").queryName("followup_state")
      .outputMode("append").start()
    try {
      val batches = 24
      val perBatch = 10
      val t0 = Timestamp.valueOf("2026-01-01 00:00:00").getTime
      val series = scala.collection.mutable.ArrayBuffer[Long]()
      for (b <- 0 until batches) {
        // each batch is one hour later; rows a minute apart so the
        // 10-minute join range emits matches inside every batch
        val data = (0 until perBatch).map { i =>
          (b.toLong * perBatch + i,
            new Timestamp(t0 + b * 3600000L + i * 60000L), 1L)
        }
        in.addData(data: _*)
        q.processAllAvailable()
        series += stateRows(q)
      }
      val fed = batches * perBatch * 2L // both join sides buffer
      // watermark (1h) + join range (10min) retain ~2 batches/side;
      // a leak shows as state ~ fed (480). Generous 100-row ceiling
      // still proves 5× sublinear.
      assert(series.max <= 100,
        s"interval-join state reached ${series.max} of $fed fed rows " +
          s"— watermark expiry is not bounding the buffer: $series")
      // plateau, not growth: the second half of the run must not
      // trend above the first half's ceiling
      assert(series.takeRight(8).max <= series.take(16).max,
        s"state still growing late in the run: $series")
      assert(spark.table("followup_state").count() > 0)
    } finally q.stop()
  }
}
