package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MediaHeaders, MultimodalOps}

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

  // ── real header decoding (MediaHeaders, no codec library) ──────────

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(24)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    out.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
    out.array()
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(64)
    out.put(Array(0xff, 0xd8).map(_.toByte))               // SOI
    out.put(Array(0xff, 0xe0).map(_.toByte)).putShort(16)  // APP0, len 16
      .put(new Array[Byte](14))
    out.put(Array(0xff, 0xc0).map(_.toByte)).putShort(11)  // SOF0
      .put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    out.array()
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++ Array[Byte](
      (w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
      (h & 0xff).toByte, ((h >> 8) & 0xff).toByte)

  test("MediaHeaders sniffs PNG/JPEG/GIF dimensions from raw bytes " +
    "and rejects junk") {
    assert(MediaHeaders.sniff(pngBytes(640, 360))
      .contains(MediaHeaders.Sniffed("png", 640, 360)))
    assert(MediaHeaders.sniff(jpegBytes(1920, 1080))
      .contains(MediaHeaders.Sniffed("jpeg", 1920, 1080)))
    assert(MediaHeaders.sniff(gifBytes(320, 200))
      .contains(MediaHeaders.Sniffed("gif", 320, 200)))
    assert(MediaHeaders.sniff("just some text".getBytes).isEmpty)
    assert(MediaHeaders.sniff(Array.empty[Byte]).isEmpty)
    assert(MediaHeaders.sniff(null).isEmpty)
  }

  test("sniffFeatures decodes real headers in the Spark pipeline and " +
    "falls back to the stub for unknown payloads") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val media = Seq(
      (1L, pngBytes(640, 360)),
      (2L, jpegBytes(800, 600)),
      (3L, "not media".getBytes)
    ).toDF("doc_id", "content")
    val got = MultimodalOps.sniffFeatures(media).collect()
      .map(m => m.doc_id -> m).toMap
    assert(got(1L).format == "png" &&
      got(1L).width == 640 && got(1L).height == 360)
    assert(got(2L).format == "jpeg" &&
      got(2L).width == 800 && got(2L).height == 600)
    assert(got(3L).format == "unknown")   // stub fallback, not a crash
    assert(got(3L).n_bytes == "not media".getBytes.length)
  }
}
