package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = TestSpark.sf0001

  test("media table carries binary payload + typed metadata struct") {
    val mt = MultimodalOps.mediaTable(spark, dir)
    val schema = mt.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(mt.count() > 0)
  }

  test("decodeFeatures: mapPartitions decode stub is deterministic and " +
    "byte-length consistent with metadata") {
    val f1 = MultimodalOps.decodeFeatures(spark, dir).collect().sortBy(_.doc_id)
    val f2 = MultimodalOps.decodeFeatures(spark, dir).collect().sortBy(_.doc_id)
    assert(f1.toSeq == f2.toSeq)
    val meta = MultimodalOps.q_media_meta(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    f1.foreach(f => assert(f.n_bytes.toLong == meta(f.doc_id)))
  }

  test("frameSample fans out exactly n_frames rows per doc") {
    val frames = MultimodalOps.frameSample(spark, dir)
      .groupBy("doc_id").count()
    val meta = MultimodalOps.q_media_meta(spark, dir)
      .select($"doc_id", $"n_frames")
    val bad = frames.join(meta, "doc_id")
      .filter($"count" =!= $"n_frames").count()
    assert(bad == 0)
  }
}
