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

  // ── full sample decode (BMP raster / PCM WAV — no codec library) ──

  /** Hand-built 24-bit BI_RGB BMP, 2×2, BOTTOM-UP rows with 2 pad
    * bytes per row (stride 8). Raster top-down:
    * (red, green) / (blue, white).
    */
  private def bmpBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(54 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(70).putInt(0).putInt(54)
    bb.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(16).putInt(0).putInt(0).putInt(0).putInt(0)
    // bottom row first (bottom-up): blue, white, then 2 pad bytes
    bb.put(Array(0xff, 0, 0, 0xff, 0xff, 0xff, 0, 0).map(_.toByte))
    // top row: red (BGR: 0,0,ff), green (0,ff,0), pad
    bb.put(Array(0, 0, 0xff, 0, 0xff, 0, 0, 0).map(_.toByte))
    bb.array()
  }

  /** Hand-built PCM WAV: 16-bit mono 8 kHz, a junk chunk BETWEEN fmt
    * and data (the chunk walk must skip it), samples
    * [0, 1000, -1000, 32767, -32768].
    */
  private def wavBytes: Array[Byte] = {
    val samples = Seq[Short](0, 1000, -1000, 32767, -32768)
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(12 + 24 + 12 + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 12 + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("LIST".getBytes).putInt(4).put("INFO".getBytes) // skipped chunk
    bb.put("data".getBytes).putInt(dataLen)
    samples.foreach(v => bb.putShort(v))
    bb.array()
  }

  test("bmpPixels decodes a bottom-up padded 24-bit raster to exact " +
    "top-down RGB values") {
    val r = MediaHeaders.bmpPixels(bmpBytes).get
    assert(r.width == 2 && r.height == 2)
    assert(r.pixels.toSeq ==
      Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff))
    // truncated pixel array / wrong bpp → None, not garbage
    assert(MediaHeaders.bmpPixels(bmpBytes.take(60)).isEmpty)
    assert(MediaHeaders.bmpPixels("BMnot a bitmap".getBytes).isEmpty)
  }

  test("wavSamples walks RIFF chunks and decodes exact 16-bit PCM " +
    "values incl. sign extension") {
    val p = MediaHeaders.wavSamples(wavBytes).get
    assert(p.sampleRate == 8000 && p.channels == 1 && p.bits == 16)
    assert(p.samples.toSeq == Seq(0, 1000, -1000, 32767, -32768))
    assert(MediaHeaders.wavSamples("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  test("8-bit PCM is re-centered to signed") {
    val bb = java.nio.ByteBuffer.allocate(44 + 3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 3).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
    bb.put("data".getBytes).putInt(3)
    bb.put(Array(0, 128, 255).map(_.toByte))
    assert(MediaHeaders.wavSamples(bb.array()).get.samples.toSeq ==
      Seq(-128, 0, 127))
  }

  test("decodeContent in the Spark pipeline: real BMP/WAV samples, " +
    "stub fallback for entropy-coded payloads") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val media = Seq(
      (1L, bmpBytes), (2L, wavBytes), (3L, jpegBytes(800, 600))
    ).toDF("doc_id", "content")
    val got = MultimodalOps.decodeContent(media).collect()
      .map(d => d.doc_id -> d).toMap
    assert(got(1L).format == "bmp" && got(1L).kind == "image" &&
      got(1L).n_samples == 4)
    assert(got(2L).format == "wav" && got(2L).kind == "audio" &&
      got(2L).n_samples == 5 && got(2L).width == 8000)
    // decoded-value checksums match a locally-computed rolling hash
    def ck(vals: Seq[Int]): Long =
      vals.foldLeft(1125899906842597L)((a, v) => a * 31 + v)
    assert(got(1L).sample_checksum ==
      ck(Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)))
    assert(got(2L).sample_checksum == ck(Seq(0, 1000, -1000, 32767, -32768)))
    // JPEG pixels genuinely need a codec: stub path, flagged as such,
    // but the header dimensions are still real
    assert(got(3L).kind == "stub" && got(3L).format == "jpeg" &&
      got(3L).width == 800 && got(3L).height == 600)
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
