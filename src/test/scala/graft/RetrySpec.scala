package graft

import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.datatables._

class RetrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Transport failing the first `failures` calls of each method. */
  private class Flaky(failures: Int) extends DataTablesTransport {
    val countCalls = new AtomicInteger()
    val fetchCalls = new AtomicInteger()
    private val inner = FixtureTransport(
      (1 to 10).map(i => Map("ID" -> i.toString, "V" -> s"v$i")), "ID")
    override def count(sc: Option[String], sv: Option[String]): Long = {
      if (countCalls.incrementAndGet() <= failures) sys.error("flaky count")
      inner.count(sc, sv)
    }
    override def fetch(req: PageRequest): Seq[Seq[String]] = {
      if (fetchCalls.incrementAndGet() <= failures) sys.error("flaky fetch")
      inner.fetch(req)
    }
  }

  test("retrying transport absorbs up to maxRetries failures (S5 rule)") {
    val flaky = new Flaky(failures = 2)
    TransportRegistry.register("flaky2", RetryingTransport(flaky, maxRetries = 2))
    val df = spark.read.format("graft.sources.datatables.DefaultSource")
      .option("transport", "flaky2").option("columns", "ID,V").load()
    assert(df.count() == 10)
  }

  test("exhausted retries surface the error (no silent page loss)") {
    TransportRegistry.register("flaky9",
      RetryingTransport(new Flaky(failures = 10), maxRetries = 2))
    val df = spark.read.format("graft.sources.datatables.DefaultSource")
      .option("transport", "flaky9").option("columns", "ID,V").load()
    intercept[Exception] { df.count() }
  }

  test("registerViews makes fixture tables SQL-addressable (S7)") {
    Tables.registerViews(spark, TestSpark.sf0001)
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) == 6000)
    Tables.registerViews(spark, TestSpark.sf0001) // idempotent re-run
    assert(spark.sql("SELECT count(*) FROM region").head().getLong(0) == 5)
  }
}
