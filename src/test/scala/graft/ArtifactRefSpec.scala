package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-close artifact hygiene (VERDICT r9 item 7): every "see
  * <key>" cross-reference inside BENCH_SCALE.json notes must resolve
  * to a key that actually exists somewhere in the artifact — r9
  * shipped a note promising `r9c_stream_join_multibatch` that was
  * never recorded, and on a repo whose credibility model is "claims
  * carry machine-checked artifacts" a dangling pointer is a
  * wrongness, not a gap. Runs in `sbt test` so the round cannot close
  * with one.
  */
class ArtifactRefSpec extends AnyFunSuite {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private def allKeys(v: JValue): Set[String] = v match {
    case JObject(fields) =>
      fields.map(_._1).toSet ++ fields.flatMap(f => allKeys(f._2))
    case JArray(items) => items.flatMap(allKeys).toSet
    case _ => Set.empty
  }

  private def allStrings(v: JValue): Seq[String] = v match {
    case JString(s) => Seq(s)
    case JObject(fields) => fields.flatMap(f => allStrings(f._2))
    case JArray(items) => items.flatMap(allStrings)
    case _ => Seq.empty
  }

  // a reference is a key-shaped token (must contain an underscore, so
  // prose like "see it" / "see above" never matches) after "see"
  private val seeRef = raw"see\s+([A-Za-z0-9]+(?:_[A-Za-z0-9.]+)+)".r

  test("every 'see <key>' in BENCH_SCALE.json notes resolves to an " +
    "existing key in the artifact") {
    val path = java.nio.file.Paths.get("BENCH_SCALE.json")
    assume(java.nio.file.Files.exists(path), "no BENCH_SCALE.json here")
    val doc = JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))
    val keys = allKeys(doc)
    val dangling = allStrings(doc)
      .flatMap(s => seeRef.findAllMatchIn(s).map(_.group(1)))
      .distinct.filterNot(keys.contains)
    assert(dangling.isEmpty,
      s"dangling BENCH_SCALE cross-references: ${dangling.mkString(", ")}")
  }
}
