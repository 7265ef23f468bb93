package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself (SparkEntry ↔ Oracles drift). */
class ContractSpec extends AnyFunSuite {

  /** Ops implemented but deliberately not oracle-declared (no faithful
    * DuckDB twin — SURVEY §2.12 allows omission → rows-only check).
    */
  private val rowsOnly = Set("q_agg_approx_distinct", "q_ann_lsh", "q_ann_ivf",
    "q_profile_approx", "q_agg_quantile_approx",
    // deflate has no DuckDB twin; properties pinned in CompressSpec
    "q_compress_ratio",
    // k-means codebooks have no DuckDB twin; VectorOpsSpec pins
    // determinism, MSE monotonicity in k, and ADC recall
    "q_vec_pq", "q_ann_ivfpq")

  test("every oracle key has a query implementation") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query is oracle-declared or a documented rows-only op") {
    val undeclared =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(undeclared.isEmpty,
      s"queries silently missing an oracle: $undeclared")
  }

  test("rows-only list stays minimal") {
    val stale = rowsOnly -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"rows-only entries with no query: $stale")
    // an entry that HAS an oracle no longer belongs here (this is how
    // q_datatables_scan's graduation to hash-gated was nearly missed)
    val graduated = rowsOnly & SparkEntry.oracleSql.keySet
    assert(graduated.isEmpty, s"rows-only entries that are oracle-declared: $graduated")
  }

  test("every oracle statement ends with an ORDER BY (determinism rule 1)") {
    val bad = SparkEntry.oracleSql.filterNot { case (_, sql) =>
      val tail = sql.toUpperCase.replaceAll("\\s+", " ")
      tail.lastIndexOf("ORDER BY") > tail.lastIndexOf("GROUP BY")
    }
    assert(bad.isEmpty, s"oracles without trailing ORDER BY: ${bad.keys}")
  }

  test("queries map is stable (no duplicate keys lost to Map semantics)") {
    assert(SparkEntry.queries.size >= 47)
    assert(SparkEntry.oracleSql.size >= 44)
  }
}
