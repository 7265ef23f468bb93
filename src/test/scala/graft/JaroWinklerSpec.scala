package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JaroWinkler

/** The JaroWinkler expression's contract is DuckDB bit-parity — the
  * q_name_match oracle scores with DuckDB's builtin, so any drift is
  * a silent hash-red. Values below were pinned from
  * `SELECT jaro_winkler_similarity(a, b)` (DuckDB 1.x), including
  * the two convention corners that differ between implementations:
  * empty input → 0.0 (even for two empties) and the Winkler boost
  * gated on jaro > 0.7.
  */
class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val pinned = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("abc", "xyz", 0.0),
    // jaro = 0.6 ≤ 0.7: the 4-char common prefix must NOT boost
    ("abcdxxxxxx", "abcdyyyyyy", 0.6),
    ("a", "", 0.0),
    ("", "", 0.0),
    ("a", "a", 1.0),
    ("CRATE", "TRACE", 0.7333333333333334),
    ("abcde", "abdce", 0.9466666666666665),
    ("ab", "ba", 0.0),
    ("Customer#000001", "Customer#000010", 0.9866666666666667))

  test("pinned DuckDB jaro_winkler_similarity values, bit-exact") {
    pinned.foreach { case (a, b, want) =>
      val got = JaroWinkler.compute(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got == want, s"jw('$a','$b') = $got, want $want")
    }
  }

  test("column path agrees with direct compute and survives " +
    "whole-stage codegen") {
    // repartition keeps ConvertToLocalRelation from folding the whole
    // expression into a LocalTableScan before any codegen stage exists
    val df = pinned.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .repartition(2)
      .select(JaroWinkler($"a", $"b").as("jw"))
    // collect on df ITSELF (.as[...] would wrap a fresh, unexecuted
    // QueryExecution), then assert on the AQE-final plan
    assert(df.collect().map(_.getDouble(0)).toSeq.sorted ==
      pinned.map(_._3).sorted)
    assert(df.queryExecution.executedPlan.toString.contains("*("))
  }

  test("properties on random strings: symmetric, in [0,1], " +
    "1.0 iff equal non-empty") {
    val str = Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
    val pairs = Gen.listOfN(500, Gen.zip(str, str)).sample.get
    pairs.foreach { case (a, b) =>
      val ab = JaroWinkler.compute(
        UTF8String.fromString(a), UTF8String.fromString(b))
      val ba = JaroWinkler.compute(
        UTF8String.fromString(b), UTF8String.fromString(a))
      assert(ab == ba, s"asymmetric on '$a','$b'")
      assert(ab >= 0.0 && ab <= 1.0)
      if (a.nonEmpty && a == b) assert(ab == 1.0)
      if (ab == 1.0) assert(a == b && a.nonEmpty)
    }
  }
}
