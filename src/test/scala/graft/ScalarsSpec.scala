package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Scalars

/** Pins the reference's typify / key-normalization edge semantics
  * (FIXTURES.md §2 edge-case table; rules cited from
  * /root/reference/clients/dynamodb.py:51-72 and
  * clients/exclusion_requests.py:39-54).
  */
class ScalarsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def typedOf(vals: String*): Seq[(Option[Long], Option[Double])] =
    vals.toDF("v")
      .select(Scalars.typifyLong($"v").as("l"), Scalars.typifyDouble($"v").as("d"))
      .collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        Option(r.get(1)).map(_.asInstanceOf[Double])))
      .toSeq

  test("typify: int-first cascade (dynamodb.py:55-57)") {
    assert(typedOf("42") == Seq((Some(42L), None)))
  }

  test("typify: float fallback (dynamodb.py:59-61)") {
    assert(typedOf("4.20") == Seq((None, Some(4.2))))
  }

  test("typify: 1E1771 / inf / nan guard (dynamodb.py:53-54)") {
    assert(typedOf("1E1771", "inf", "nan", "-inf", "1e5")
      == Seq.fill(5)((None, None)))
  }

  test("typify: non-numeric strings stay strings") {
    assert(typedOf("signup", "", "  ", "1.2.3")
      == Seq.fill(4)((None, None)))
  }

  test("typify: whitespace is trimmed first (str().strip(), :53)") {
    assert(typedOf(" 7 ") == Seq((Some(7L), None)))
  }

  test("typify property: total (never throws), legs mutually exclusive, " +
    "long leg only on integer literals") {
    val gen = Gen.oneOf(
      Arbitrary.arbitrary[String],
      Gen.numStr,
      Arbitrary.arbitrary[Double].map(_.toString),
      Arbitrary.arbitrary[Long].map(_.toString))
    val samples = Gen.listOfN(300, gen).sample.getOrElse(Nil)
    val results = typedOf(samples: _*) // one batched Spark job
    samples.zip(results).foreach { case (s, (l, d)) =>
      if (l.isDefined) {
        assert(d.isEmpty, s"both legs fired for '$s'")
        assert(s.trim.matches("[+-]?[0-9]{1,18}"), s"long leg fired for '$s'")
      }
      if (d.isDefined)
        assert(s.trim.matches("[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)") &&
          !s.toLowerCase.contains("e"), s"double leg fired for '$s'")
    }
  }

  test("normalizeKey strips scrape prefixes (exclusion_requests.py:45-48)") {
    val got = Seq("BIS232Request.Foo", "JSONData.Bar", "BIS232Objection.Baz",
      "BIS232ObjectionRebuttalQux", "Plain",
      // str.replace strips occurrences ANYWHERE, not just a prefix
      // (exclusion_requests.py:45-48)
      "JSONData.BIS232Request.Foo", "A.BIS232Objection.B")
      .toDF("k").select(Scalars.normalizeKey($"k")).as[String].collect().toSeq
    assert(got == Seq("Foo", "Bar", "Baz", "Qux", "Plain", "Foo", "A.B"))
  }

  test("keyOrUntitled fallback naming (exclusion_requests.py:40-44)") {
    val got = Seq(("Title", "name", 0), ("", "name", 1), ("", "", 3), (" ", null, 4))
      .toDF("t", "n", "i")
      .select(Scalars.keyOrUntitled($"t", $"n", $"i")).as[String].collect().toSeq
    assert(got == Seq("Title", "name", "Untitled3", "Untitled4"))
  }
}
