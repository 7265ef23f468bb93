package graft.sources.datatables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared-query wrapper around the DataTables DSv2 source (SURVEY
  * §2.1 S1) so the driver exercises the connector end-to-end every
  * round, not just through its ScalaTest suite: paged parallel read
  * (3 input partitions at 2 500 rows / 1 000-row pages), search-value
  * filter pushdown (the protocol's `search.value`,
  * reference clients/exclusion_requests.py:81-82), and
  * column-descriptor projection all sit on the executed path.
  *
  * Rows-only by design: the source IS the table (there is no parquet
  * twin for DuckDB to scan), so the contract records a rows>0 check;
  * the wire-level semantics are pinned by DataTablesSourceSpec /
  * HttpTransportSpec. The fixture is deterministic, so the output
  * frame is too.
  */
object DataTablesQueries {
  private val pageSize = 1000

  /** Deterministic stand-in for the portal: same shape as the
    * reference's SummaryView rows (ID, company, HTS code, status).
    */
  private def fixtureRecords: Seq[Map[String, String]] =
    (1 to 2500).map { i =>
      Map(
        "ID" -> f"$i%06d",
        "Company" -> s"Co${i % 7}",
        "HTSUSCode" -> s"72${i % 5}",
        "PublicStatus" -> (if (i % 3 == 0) "GRANTED" else "PENDING"))
    }

  def q_datatables_scan(s: SparkSession, dir: String): DataFrame = {
    // idempotent per-call registration (driver + executors share the
    // JVM in local mode; a cluster deployment would construct an HTTP
    // transport from options instead — no registry involved)
    TransportRegistry.register("erc_declared",
      FixtureTransport(fixtureRecords, "ID"))
    val df = s.read.format("graft.sources.datatables.DefaultSource")
      .option("transport", "erc_declared")
      .option("columns", "ID,Company,HTSUSCode,PublicStatus")
      .option("searchableColumn", "HTSUSCode")
      .option("pageSize", pageSize.toString)
      .load()
    // full scan: pages through all records in parallel partitions
    val full = df.groupBy("HTSUSCode")
      .agg(count(lit(1)).as("cnt"),
        min(col("ID")).as("min_id"), max(col("ID")).as("max_id"))
    // pushed scan: equality on the searchable column rides the wire
    // as search.value and shrinks paging to a single page
    val pushed = df.filter(col("HTSUSCode") === "722")
      .groupBy("HTSUSCode").agg(count(lit(1)).as("pushed_cnt"))
    full.join(pushed, Seq("HTSUSCode"), "left")
      .orderBy("HTSUSCode")
  }
}
