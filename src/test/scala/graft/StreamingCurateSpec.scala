package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.streaming.Streams

/** VERDICT r4 item #5: the streaming pieces were each spec'd against
  * batch twins, but nothing composed them. This spec runs the FULL
  * streaming curation pipeline (lang gate → quality gate → decontam
  * probe → streaming exact dedup → parquet LWW sink) end-to-end over
  * a landing directory fed in 10 micro-batches plus re-deliveries,
  * and asserts:
  *   - the sink's final survivors are IDENTICAL to the same
  *     composition run in batch (curateStream is mode-agnostic — one
  *     definition, two engines);
  *   - re-delivered files change nothing (LWW idempotence);
  *   - state rows stay bounded by DISTINCT surviving content, not by
  *     rows fed (StateBoundSpec-style, from stateOperators metrics).
  */
class StreamingCurateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("composed streaming curation equals its batch twin with bounded " +
    "state across 10+ micro-batches and idempotent re-delivery") {
    val docs = graft.Tables(spark, dir, "documents")
    val evalArr = TextOps.evalShingles(spark, dir)
      .collect().map(_.getString(0)).toSeq

    val work = java.nio.file.Files.createTempDirectory("graft-curate")
    val landing = work.resolve("landing").toString
    val out = work.resolve("survivors.parquet").toString
    val ckpt = work.resolve("ckpt").toString
    new java.io.File(landing).mkdirs()

    // 10 doc_id-range slices of the fixture corpus, staged one per
    // micro-batch as FLAT files in the landing root (the file stream
    // source does not recurse into subdirectories; re-deliveries get
    // a fresh name — the source tracks processed files by path)
    val nSlices = 10
    def stage(slice: Int, tag: String): Unit = {
      import scala.jdk.CollectionConverters._
      val tmp = work.resolve(s"stage_${slice}_$tag")
      docs.filter(col("doc_id") % nSlices === slice)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part,
        java.nio.file.Paths.get(landing, s"slice_${slice}_$tag.parquet"))
    }

    val q = Streams.curateQuery(spark, landing, evalArr, out, ckpt)
    def stateRows: Long =
      q.recentProgress.reverse.iterator
        .map(_.stateOperators.map(_.numRowsTotal).sum)
        .find(_ > 0).getOrElse(0L)
    try {
      val series = scala.collection.mutable.ArrayBuffer[Long]()
      for (s <- 0 until nSlices) {
        stage(s, "a")
        q.processAllAvailable()
        series += stateRows
      }
      val afterAll = stateRows
      // re-deliver three slices (at-least-once ingestion): state must
      // not grow — the hashes re-reduce into existing keys
      Seq(0, 3, 7).foreach { s => stage(s, "b"); q.processAllAvailable() }
      assert(stateRows == afterAll,
        s"re-delivery grew state $afterAll -> $stateRows")
      // bounded by distinct surviving content: state rows = exactly
      // the batch twin's row count (one state row per survivor hash)
      val twin = Streams.curateStream(docs, evalArr)
      val twinRows = twin.collect()
      assert(afterAll == twinRows.length,
        s"state rows $afterAll != distinct surviving hashes ${twinRows.length}")
      assert(series.last == series.max, s"state not monotone-bounded: $series")

      // the sink's survivors equal the batch twin, row for row
      val got = spark.read.parquet(out)
        .select("text_hash", "doc_id", "n_tok", "score", "pred_lang")
        .collect().map(_.toSeq).sortBy(_.toString)
      val want = twinRows.map(_.toSeq).sortBy(_.toString)
      assert(got.length == want.length && got.sameElements(want),
        s"streaming survivors (${got.length}) != batch twin (${want.length})")
      assert(got.nonEmpty, "empty survivor set proves nothing")

      // and the composition actually gated something: survivors are a
      // strict subset of the corpus
      assert(got.length < docs.count())
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(work.toFile)
    }
  }
}
