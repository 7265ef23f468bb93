package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (builder mandate): media payloads are
  * opaque `binary` columns beside a typed metadata struct; decode /
  * feature-extraction runs batched per partition. Decode coverage:
  * headers for PNG/JPEG/GIF/BMP/WAV and FULL sample decode for ALL
  * FIVE containers — BMP rasters, PCM WAV, PNG (JDK zlib inflate +
  * scanline unfiltering), GIF (pure-code LZW), and baseline JPEG
  * (pure-code Huffman + IDCT, [[JpegBaseline]]) — all via
  * [[MediaHeaders]], no external codec library. Only layouts outside
  * decoder coverage (progressive/arithmetic JPEG, 16-bit PNG,
  * interlaced GIF, float WAV, …) fall back to
  * [[MultimodalOps.decodeStub]] — a clearly-marked deterministic
  * fake whose rows carry kind='stub'.
  *
  * Scale posture: payload bytes never shuffle — metadata is derived
  * map-side and the per-frame fan-out is a generator (explode over a
  * bounded sequence), not a join. At 100 TB the binary column stays
  * in parquet until the decode stage touches it, one partition at a
  * time.
  */
object MultimodalOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** A decoded-media record produced by the (stubbed) codec. */
  case class MediaFeature(doc_id: Long, n_bytes: Int, width: Int,
    height: Int, n_frames: Int, checksum: Long)

  /** Media table synthesized from documents: the text payload cast to
    * a binary `content` column + typed metadata — the declared
    * multimodal column layout.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      col("text").cast("binary").as("content"),
      struct(
        lit("text/plain").as("mime"),
        col("source").as("origin"),
        col("n_chars").as("declared_bytes")).as("meta"))

  /** Declared metadata query: byte length + fake decoded dimensions,
    * all via integer expressions on the binary column (no stub needed
    * — this part is real in any deployment).
    */
  def q_media_meta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(
        col("doc_id"),
        length(col("content")).cast("long").as("n_bytes"),
        (length(col("content")) % 640 + 1).cast("long").as("fake_width"),
        (length(col("content")) % 480 + 1).cast("long").as("fake_height"),
        (length(col("content")) % 5 + 1).cast("long").as("n_frames"))
      .orderBy("doc_id")

  /** STUB — the fallback for payloads OUTSIDE the real decoders'
    * coverage (progressive/arithmetic JPEG, 16-bit PNG, interlaced
    * GIF, float WAV, unrecognized containers). The dominant layout of
    * every container decodes for real: BMP rasters, PCM WAV samples,
    * PNG, GIF, and baseline JPEG pixels
    * ([[MediaHeaders.bmpPixels]] / [[MediaHeaders.wavSamples]] /
    * [[MediaHeaders.pngPixels]] / [[MediaHeaders.gifPixels]] /
    * [[MediaHeaders.jpegPixels]] via [[decodeContent]]).
    * Deterministic fake: dimensions and checksum derived from the
    * payload bytes. The mapPartitions plumbing around it (batching,
    * encoder, schema) is the real deliverable.
    */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaFeature = {
    val n = payload.length
    var ck = 1125899906842597L // deterministic FNV-ish rolling checksum
    var i = 0
    while (i < n) { ck = ck * 31 + (payload(i) & 0xff); i += 1 }
    MediaFeature(docId, n, n % 640 + 1, n % 480 + 1, n % 5 + 1, ck)
  }

  /** Batched per-partition decode: the shape a real codec integration
    * takes (one codec instance per partition, streamed batches, typed
    * output). Returns a Dataset with a fixed schema downstream ops
    * can rely on.
    */
  def decodeFeatures(s: SparkSession, dir: String): Dataset[MediaFeature] = {
    import s.implicits._
    mediaTable(s, dir)
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // codec init would happen here, once per partition
        rows.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** A sniffed-media record: REAL container format + dimensions where
    * the header is recognized, stub-derived fields otherwise.
    */
  case class MediaInfo(doc_id: Long, format: String, width: Int,
    height: Int, n_bytes: Int)

  /** Header-sniffing decode stage: the same per-partition batched
    * shape as [[decodeFeatures]], but the format/dimension fields are
    * REAL for recognized containers ([[MediaHeaders]] — PNG/JPEG/GIF/
    * BMP/WAV, pure byte arithmetic, no codec library). Unrecognized
    * payloads fall back to the deterministic stub dimensions with
    * format 'unknown' — only pixel/sample decoding remains stubbed.
    */
  def sniffFeatures(media: DataFrame)(implicit s: SparkSession): Dataset[MediaInfo] = {
    import s.implicits._
    media
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          MediaHeaders.sniff(bytes) match {
            case Some(h) => MediaInfo(id, h.format, h.width, h.height,
              if (bytes == null) 0 else bytes.length)
            case None =>
              val f = decodeStub(id, if (bytes == null) Array.empty else bytes)
              MediaInfo(id, "unknown", f.width, f.height, f.n_bytes)
          }
        }
      }
  }

  /** One decoded payload: real sample data where the container is
    * uncompressed (BMP / PCM WAV), stub-derived fields otherwise.
    * `n_samples` = pixels for rasters, interleaved samples for audio;
    * `sample_checksum` is a rolling hash over the DECODED values (not
    * the container bytes), so a wrong pixel order / padding / sign
    * extension changes it.
    */
  case class DecodedContent(doc_id: Long, format: String, kind: String,
    width: Int, height: Int, n_samples: Int, sample_checksum: Long)

  private def rollingChecksum(vals: Array[Int]): Long = {
    var ck = 1125899906842597L
    var i = 0
    while (i < vals.length) { ck = ck * 31 + vals(i); i += 1 }
    ck
  }

  /** Full decode stage: same per-partition batched shape as
    * [[decodeFeatures]], but BMP, PNG, GIF, baseline-JPEG and PCM WAV
    * payloads yield their REAL decoded samples (MediaHeaders, no
    * external codec library); out-of-coverage / unrecognized payloads
    * fall back to the stub with kind 'stub'. MultimodalSpec pins
    * exact pixel/sample values on hand-built containers in all five
    * real formats.
    */
  def decodeContent(media: DataFrame)(implicit s: SparkSession): Dataset[DecodedContent] = {
    import s.implicits._
    media
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          def raster(fmt: String, r: MediaHeaders.Raster) =
            DecodedContent(id, fmt, "image", r.width, r.height,
              r.pixels.length, rollingChecksum(r.pixels))
          MediaHeaders.bmpPixels(bytes).map(raster("bmp", _))
            .orElse(MediaHeaders.pngPixels(bytes).map(raster("png", _)))
            .orElse(MediaHeaders.gifPixels(bytes).map(raster("gif", _)))
            .orElse(MediaHeaders.jpegPixels(bytes).map(raster("jpeg", _)))
            .orElse(MediaHeaders.wavSamples(bytes).map { p =>
              DecodedContent(id, "wav", "audio", p.sampleRate, p.channels,
                p.samples.length, rollingChecksum(p.samples))
            })
            .getOrElse {
              // outside decoder coverage (progressive/arithmetic JPEG,
              // 16-bit PNG, interlaced GIF, …) or unrecognized: header
              // dims are still real where the container is known;
              // sample decode is the stub (kind marks it)
              val f = decodeStub(id, if (bytes == null) Array.empty else bytes)
              MediaHeaders.sniff(bytes) match {
                case Some(h) => DecodedContent(id, h.format, "stub",
                  h.width, h.height, 0, f.checksum)
                case None => DecodedContent(id, "unknown", "stub",
                  f.width, f.height, 0, f.checksum)
              }
            }
        }
      }
  }

  /** Frame-sampling fan-out: one row per sampled frame index, bounded
    * by n_frames — generator-style (explode over sequence), the same
    * plan shape a video pipeline uses to fan a clip into frames.
    */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    q_media_meta(s, dir)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .orderBy("doc_id", "frame_idx")

  /** Declared twin of [[frameSample]] (oracle: unnest(range(n))). */
  def q_media_frames(s: SparkSession, dir: String): DataFrame =
    frameSample(s, dir)
}
