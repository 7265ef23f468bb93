package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, max, min}
import org.apache.spark.sql.types._

/** Guards the driver contract itself (SparkEntry ↔ Oracles drift),
  * including the HARNESS-representability rules learned in round 5:
  * the driver's comparator loads both sides into pandas and
  * `sort_values` over every column, so a declared output must contain
  * only scalar atomic columns (an `array<...>` column raises inside
  * pandas before any compare happens) and every timestamp must fit in
  * datetime64[ns] (1677-09-21 .. 2262-04-11 — the 9999-12-31 SCD2
  * sentinel was silently mangled into a hash-red). These rules are
  * pinned here so a new query can't re-ship the failure class.
  */
class ContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  /** Ops implemented but deliberately not oracle-declared (no faithful
    * DuckDB twin — SURVEY §2.12 allows omission → rows-only check).
    */
  private val rowsOnly = Set("q_agg_approx_distinct", "q_ann_lsh", "q_ann_ivf",
    "q_profile_approx", "q_agg_quantile_approx",
    // deflate has no DuckDB twin; properties pinned in CompressSpec
    "q_compress_ratio",
    // k-means codebooks have no DuckDB twin; VectorOpsSpec pins
    // determinism, MSE monotonicity in k, and ADC recall
    "q_vec_pq", "q_ann_ivfpq",
    // byte-level decode → resize → feature extraction has no DuckDB
    // twin; MultimodalSpec pins exact pixel/PCM feature values
    "q_media_features",
    // perceptual image hashing rides the same decode boundary;
    // MultimodalSpec pins the dHash bits and banding guarantees
    "q_media_dhash",
    // the eigen step has no DuckDB twin; the covariance HALF is
    // hash-gated (q_vec_cov) and VectorOpsSpec pins orthonormality,
    // trace preservation, and projection-variance ≡ eigenvalue
    "q_vec_pca",
    // HLL sketches have no DuckDB twin; AnalyticsSpec pins every
    // estimate within the rsd envelope of the exact intersection
    "q_hll_overlap",
    // the sigmoid's IEEE exp has no faithful DuckDB twin; TextOpsSpec
    // pins the trained weights BIT-EXACTLY against an independent
    // in-test reference (the jacobiEigen precedent), monotone loss
    // decrease, an accuracy floor, and distractor-weight shrinkage
    "q_logreg",
    // AdaBoost's exp/ln weight path rides the same boundary;
    // TextOpsSpec pins the stump sequence + alphas bit-exactly vs an
    // independent reference, per-round weighted error < 1/2, and an
    // accuracy floor
    "q_boost")

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

  /** Pandas-hashable scalar types. Binary is excluded on purpose: the
    * comparator stringifies cell values and raw bytes round-trip
    * differently per engine.
    */
  private def scalarOk(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType | _: BinaryType => false
    case _ => true
  }

  test("declared outputs contain only comparator-safe scalar columns " +
    "(no array/map/struct/binary — pandas sort_values dies on them)") {
    // schema needs only analysis, not execution: cheap for all 196
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, f) =>
      val offenders = f(spark, dir).schema.fields
        .filterNot(fd => scalarOk(fd.dataType))
        .map(fd => s"$name.${fd.name}: ${fd.dataType.simpleString}")
      offenders
    }
    assert(bad.isEmpty, s"non-scalar declared output columns: $bad")
  }

  test("declared timestamp outputs stay inside pandas datetime64[ns] " +
    "(1677-09-21 .. 2262-04-11 — outside it the driver mangles values)") {
    val lo = java.sql.Timestamp.valueOf("1677-09-22 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2262-04-11 00:00:00")
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, f) =>
      val df = f(spark, dir)
      val tsCols = df.schema.fields.collect {
        case fd if fd.dataType == TimestampType ||
          fd.dataType == TimestampNTZType => fd.name
      }
      if (tsCols.isEmpty) Nil
      else {
        val aggs = tsCols.flatMap(c => Seq(
          min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c")))
        val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        tsCols.flatMap { c =>
          Seq(s"mn_$c", s"mx_$c").flatMap { a =>
            Option(r.getAs[Any](a)).collect {
              case t: java.sql.Timestamp
                if t.before(lo) || t.after(hi) => s"$name.$c=$t"
              case t: java.time.LocalDateTime
                if t.isBefore(lo.toLocalDateTime) ||
                  t.isAfter(hi.toLocalDateTime) => s"$name.$c=$t"
            }
          }
        }
      }
    }
    assert(bad.isEmpty, s"timestamps outside pandas range: $bad")
  }
}
