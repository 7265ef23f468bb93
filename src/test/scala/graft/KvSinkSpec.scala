package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{KvClient, KvClientFactory, KvSink}

/** In-memory KV store shared across executor threads (local mode =
  * one JVM, so a singleton stands in for the remote table). The first
  * `bounceBudget` putBatch calls reject the whole batch as
  * unprocessed (DynamoDB throttle shape) without storing anything.
  */
object FakeKv {
  val store = new ConcurrentHashMap[String, Map[String, String]]()
  val calls = new AtomicInteger(0)
  val maxBatchSeen = new AtomicInteger(0)
  val bounceBudget = new AtomicInteger(0)

  def reset(bounces: Int = 0): Unit = {
    store.clear(); calls.set(0); maxBatchSeen.set(0)
    bounceBudget.set(bounces)
  }
}

class FakeKvClient extends KvClient {
  override def putBatch(items: Seq[Map[String, String]]): Seq[Map[String, String]] = {
    FakeKv.calls.incrementAndGet()
    FakeKv.maxBatchSeen.getAndUpdate(m => math.max(m, items.size))
    if (FakeKv.bounceBudget.getAndDecrement() > 0) items
    else { items.foreach(i => FakeKv.store.put(i("ID"), i)); Nil }
  }
}

object FakeKvFactory extends KvClientFactory {
  def apply(): KvClient = new FakeKvClient
}

/** ts-conditional PUT (DynamoDB ConditionExpression shape): a stale
  * write loses against newer stored state instead of overwriting it —
  * the store-side upgrade that closes the cross-batch replay caveat
  * documented on Streams.kvUpsertQuery.
  */
class ConditionalFakeKvClient extends KvClient {
  override def putBatch(items: Seq[Map[String, String]]): Seq[Map[String, String]] = {
    items.foreach { i =>
      val cur = FakeKv.store.get(i("ID"))
      if (cur == null || cur("ts").toLong <= i("ts").toLong)
        FakeKv.store.put(i("ID"), i)
    }
    Nil
  }
}

object ConditionalFakeKvFactory extends KvClientFactory {
  def apply(): KvClient = new ConditionalFakeKvClient
}

class KvSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("upsert LWW-reduces before writing and copies ID from the id field") {
    FakeKv.reset()
    val df = Seq((1L, "old", 1L), (1L, "new", 2L), (2L, "only", 1L))
      .toDF("doc_id", "v", "ts")
    KvSink.upsert(df, "doc_id", "ts", "doc_id", FakeKvFactory)
    assert(FakeKv.store.size() == 2)
    val one = FakeKv.store.get("1")
    assert(one("v") == "new")          // newest ts won the pre-reduce
    assert(one("ID") == one("doc_id")) // reference item shape
    // idempotent re-run
    KvSink.upsert(df, "doc_id", "ts", "doc_id", FakeKvFactory)
    assert(FakeKv.store.size() == 2 && FakeKv.store.get("1")("v") == "new")
  }

  test("batches flush at the reference size of 20 including the tail") {
    FakeKv.reset()
    val df = (1 to 45).map(i => (i.toLong, s"v$i", 1L)).toDF("doc_id", "v", "ts")
      .repartition(1)
    KvSink.upsert(df, "doc_id", "ts", "doc_id", FakeKvFactory)
    assert(FakeKv.store.size() == 45)  // partial tail batch flushed
    assert(FakeKv.maxBatchSeen.get() == 20)
    assert(FakeKv.calls.get() == 3)    // ceil(45/20) on one partition
  }

  test("null columns are omitted from the item (PUT replaces whole item)") {
    FakeKv.reset()
    val df = Seq((1L, Option.empty[String], 1L), (2L, Some("x"), 1L))
      .toDF("doc_id", "v", "ts")
    KvSink.upsert(df, "doc_id", "ts", "doc_id", FakeKvFactory)
    assert(!FakeKv.store.get("1").contains("v"))
    assert(FakeKv.store.get("2")("v") == "x")
  }

  test("unprocessed items are retried with backoff until accepted") {
    FakeKv.reset(bounces = 1)
    val df = (1 to 30).map(i => (i.toLong, s"v$i", 1L)).toDF("doc_id", "v", "ts")
      .repartition(1)
    KvSink.upsert(df, "doc_id", "ts", "doc_id", FakeKvFactory)
    assert(FakeKv.store.size() == 30)  // nothing silently lost
    // batch1: bounced once then accepted (2 calls); batch2: 1 call
    assert(FakeKv.calls.get() == 3)
  }

  test("retry exhaustion fails the task instead of dropping items") {
    FakeKv.reset(bounces = KvSink.maxRetries + 2)
    val df = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("doc_id", "v", "ts")
      .repartition(1)
    intercept[Exception] {
      KvSink.upsert(df, "doc_id", "ts", "doc_id", FakeKvFactory)
    }
    assert(FakeKv.store.isEmpty)       // rejected items were not stored
  }

  test("ts-conditional client: replaying an older batch cannot regress " +
    "state (cross-batch LWW)") {
    FakeKv.reset()
    val newer = Seq((1L, "new", 5L)).toDF("doc_id", "v", "ts")
    val older = Seq((1L, "old", 3L)).toDF("doc_id", "v", "ts")
    KvSink.upsert(newer, "doc_id", "ts", "doc_id", ConditionalFakeKvFactory)
    // a replayed stale micro-batch arrives after the newer write
    KvSink.upsert(older, "doc_id", "ts", "doc_id", ConditionalFakeKvFactory)
    assert(FakeKv.store.get("1")("v") == "new")
  }

  test("backoff grows exponentially and caps") {
    assert(KvSink.backoffMs(1) == 50L)
    assert(KvSink.backoffMs(2) == 100L)
    assert(KvSink.backoffMs(10) == 1000L)
  }
}
