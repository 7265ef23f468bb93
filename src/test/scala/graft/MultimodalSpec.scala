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

  // ── PNG pixel decode (JDK Inflater + unfilter — no codec lib) ─────

  /** Builds a real PNG: zlib-deflated scanlines, proper chunk layout
    * (CRCs are dummy — the decoder doesn't verify them). `rows` are
    * PRE-FILTERED scanlines (filter byte + filtered data) so tests
    * control exactly which filters are exercised.
    */
  private def pngFile(w: Int, h: Int, colorType: Int,
    scanlines: Array[Byte], palette: Seq[Int] = Nil,
    splitIdat: Boolean = false, depth: Int = 8,
    interlace: Int = 0): Array[Byte] = {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
        .putInt(0) // dummy CRC
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(depth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte)
    val defl = new java.util.zip.Deflater()
    defl.setInput(scanlines)
    defl.finish()
    val buf = new Array[Byte](scanlines.length * 2 + 64)
    val n = defl.deflate(buf)
    defl.end()
    val idat = buf.take(n)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val plte =
      if (palette.isEmpty) Array.empty[Byte]
      else chunk("PLTE", palette.flatMap(c => Seq(
        ((c >> 16) & 0xff).toByte, ((c >> 8) & 0xff).toByte,
        (c & 0xff).toByte)).toArray)
    val idatChunks =
      if (splitIdat)
        chunk("IDAT", idat.take(idat.length / 2)) ++
          chunk("IDAT", idat.drop(idat.length / 2))
      else chunk("IDAT", idat)
    sig ++ chunk("IHDR", ihdr.array()) ++ plte ++ idatChunks ++
      chunk("IEND", Array.empty)
  }

  /** Independent FORWARD filter (png spec §9) — the inverse of what
    * the decoder does, written from the spec, so a round-trip failure
    * implicates one side, not a shared bug.
    */
  private def filterRows(img: Array[Int], w: Int, h: Int, bpp: Int,
    filters: Seq[Int]): Array[Byte] = {
    val stride = w * bpp
    require(img.length == stride * h)
    val out = java.nio.ByteBuffer.allocate((stride + 1) * h)
    for (row <- 0 until h) {
      val ft = filters(row)
      out.put(ft.toByte)
      for (x <- 0 until stride) {
        val orig = img(row * stride + x)
        val a = if (x >= bpp) img(row * stride + x - bpp) else 0
        val b = if (row > 0) img((row - 1) * stride + x) else 0
        val c = if (row > 0 && x >= bpp) img((row - 1) * stride + x - bpp)
                else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        out.put(((orig - pred) & 0xff).toByte)
      }
    }
    out.array()
  }

  test("pngPixels decodes RGB through all five scanline filters to " +
    "exact pixel values") {
    // 2×5 RGB, one row per filter type 0..4, varied values so each
    // predictor actually predicts something nontrivial
    val px = Seq(
      0xff0000, 0x00ff00,
      0x0000ff, 0xffffff,
      0x102030, 0x405060,
      0x708090, 0xa0b0c0,
      0x112233, 0xfedcba)
    val img = px.flatMap(c =>
      Seq((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff)).toArray
    val scan = filterRows(img, 2, 5, 3, Seq(0, 1, 2, 3, 4))
    val r = MediaHeaders.pngPixels(pngFile(2, 5, 2, scan)).get
    assert(r.width == 2 && r.height == 5)
    assert(r.pixels.toSeq == px)
  }

  test("pngPixels: palette, RGBA alpha-drop, grayscale, and " +
    "multi-IDAT reassembly") {
    // color type 3: palette indices through a PLTE chunk
    val pal = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    val idx = filterRows(Array(0, 1, 2, 3), 2, 2, 1, Seq(0, 0))
    val p3 = MediaHeaders.pngPixels(pngFile(2, 2, 3, idx, pal)).get
    assert(p3.pixels.toSeq == pal)
    // color type 6: RGBA, alpha dropped from the packed raster
    val rgba = filterRows(
      Array(0x12, 0x34, 0x56, 0x80, 0xab, 0xcd, 0xef, 0x00),
      2, 1, 4, Seq(1))
    val p6 = MediaHeaders.pngPixels(pngFile(2, 1, 6, rgba)).get
    assert(p6.pixels.toSeq == Seq(0x123456, 0xabcdef))
    // color type 0: 8-bit gray replicated to RGB channels
    val gray = filterRows(Array(0, 128, 255, 7), 2, 2, 1, Seq(0, 2))
    val p0 = MediaHeaders.pngPixels(pngFile(2, 2, 0, gray)).get
    assert(p0.pixels.toSeq ==
      Seq(0x000000, 0x808080, 0xffffff, 0x070707))
    // IDAT split across two chunks must reassemble transparently
    val split = MediaHeaders.pngPixels(
      pngFile(2, 2, 0, gray, splitIdat = true)).get
    assert(split.pixels.toSeq == p0.pixels.toSeq)
  }

  test("pngPixels rejects what it cannot decode instead of emitting " +
    "garbage") {
    val gray = filterRows(Array(0, 128, 255, 7), 2, 2, 1, Seq(0, 0))
    // 16-bit depth, Adam7 interlace, truncated stream → None
    assert(MediaHeaders.pngPixels(
      pngFile(2, 2, 0, gray, depth = 16)).isEmpty)
    assert(MediaHeaders.pngPixels(
      pngFile(2, 2, 0, gray, interlace = 1)).isEmpty)
    val whole = pngFile(2, 2, 0, gray)
    assert(MediaHeaders.pngPixels(whole.take(whole.length - 20)).isEmpty)
    // palette type without a PLTE chunk → None
    assert(MediaHeaders.pngPixels(pngFile(2, 2, 3, gray)).isEmpty)
    // header-only sniff fixture (no IDAT at all) → None, not a crash
    assert(MediaHeaders.pngPixels(pngBytes(640, 360)).isEmpty)
  }

  // ── GIF pixel decode (pure-code variable-width LZW) ───────────────

  /** Packs explicit (code, bitWidth) pairs LSB-first — widths are
    * given by the test so the packer can't share a width-schedule bug
    * with the decoder — and wraps the result in ≤255-byte sub-blocks.
    */
  private def lzwBlocks(codes: Seq[(Int, Int)]): Array[Byte] = {
    val bits = scala.collection.mutable.ArrayBuffer[Int]()
    for ((code, width) <- codes; k <- 0 until width)
      bits += ((code >> k) & 1)
    val bytes = bits.grouped(8).map(g =>
      g.zipWithIndex.map { case (bit, i) => bit << i }.sum.toByte).toArray
    bytes.grouped(255).flatMap(g => g.length.toByte +: g).toArray :+
      0.toByte // block terminator
  }

  private def gifFile(w: Int, h: Int, globalTable: Seq[Int],
    minCode: Int, codes: Seq[(Int, Int)], localTable: Seq[Int] = Nil,
    withExtension: Boolean = false): Array[Byte] = {
    def table(t: Seq[Int]): Array[Byte] = t.flatMap(c => Seq(
      ((c >> 16) & 0xff).toByte, ((c >> 8) & 0xff).toByte,
      (c & 0xff).toByte)).toArray
    def sizeBits(n: Int): Int = // table length 2^(k+1) → k
      (1 to 8).find(k => (2 << (k - 1)) >= n).get - 1
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array((w & 0xff).toByte, (w >> 8).toByte,
      (h & 0xff).toByte, (h >> 8).toByte))
    val gPacked =
      if (globalTable.nonEmpty) 0x80 | sizeBits(globalTable.length)
      else 0
    out.write(Array(gPacked.toByte, 0.toByte, 0.toByte))
    if (globalTable.nonEmpty) out.write(table(globalTable))
    if (withExtension) // graphic-control extension must be skipped
      out.write(Array(0x21, 0xf9, 4, 0, 0, 0, 0, 0).map(_.toByte))
    out.write(0x2c) // image descriptor
    out.write(Array(0, 0, 0, 0).map(_.toByte)) // left, top
    out.write(Array((w & 0xff).toByte, (w >> 8).toByte,
      (h & 0xff).toByte, (h >> 8).toByte))
    val iPacked =
      if (localTable.nonEmpty) 0x80 | sizeBits(localTable.length) else 0
    out.write(iPacked)
    if (localTable.nonEmpty) out.write(table(localTable))
    out.write(minCode)
    out.write(lzwBlocks(codes))
    out.write(0x3b) // trailer
    out.toByteArray
  }

  test("gifPixels decodes a variable-width LZW stream to exact " +
    "palette colors, including the code-size growth point") {
    val pal = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    // minCode 2: clear=4 end=5; dict hits 8 entries after the 4th
    // code so the last two codes are read at 4 bits — the stream is
    // INVALID if the decoder misses the growth point
    val codes = Seq((4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4))
    val r = MediaHeaders.gifPixels(gifFile(2, 2, pal, 2, codes)).get
    assert(r.width == 2 && r.height == 2)
    assert(r.pixels.toSeq == pal)
  }

  test("gifPixels: KwKwK self-referencing code, extension skipping, " +
    "and local-table override") {
    val pal = Seq(0x000000, 0xabcdef, 0x222222, 0x333333)
    // pixels [1,1,1]: clear, 1, then code 6 == next dict slot (KwKwK)
    val kwk = Seq((4, 3), (1, 3), (6, 3), (5, 3))
    val r = MediaHeaders.gifPixels(
      gifFile(3, 1, pal, 2, kwk, withExtension = true)).get
    assert(r.pixels.toSeq == Seq(0xabcdef, 0xabcdef, 0xabcdef))
    // a local color table overrides the global one
    val local = Seq(0x111111, 0x995511, 0x444444, 0x555555)
    val r2 = MediaHeaders.gifPixels(
      gifFile(3, 1, pal, 2, kwk, localTable = local)).get
    assert(r2.pixels.toSeq == Seq(0x995511, 0x995511, 0x995511))
  }

  test("gifPixels rejects truncated/invalid streams instead of " +
    "emitting garbage") {
    val pal = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    val codes = Seq((4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4))
    val whole = gifFile(2, 2, pal, 2, codes)
    assert(MediaHeaders.gifPixels(whole.take(whole.length - 6)).isEmpty)
    // header-only fixture (no image descriptor) → None, not a crash
    assert(MediaHeaders.gifPixels(gifBytes(320, 200)).isEmpty)
    // end-of-information before the raster fills → None
    val short = Seq((4, 3), (0, 3), (5, 3))
    assert(MediaHeaders.gifPixels(gifFile(2, 2, pal, 2, short)).isEmpty)
  }

  // ── baseline JPEG pixel decode (pure-code Huffman + IDCT) ─────────
  //
  // The fixtures come from a minimal INDEPENDENT encoder below: its
  // canonical-Huffman assignment, entropy model (category bits,
  // ZRL/EOB run-lengths, byte stuffing, restart markers) and the
  // reference IDCT used for expected pixels are all written from the
  // T.81 spec separately from the decoder, so a shared bug can't
  // self-validate.

  private val testZigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex-C canonical code assignment: symbol → (code, bitLength). */
  private def huffAssign(counts: Seq[Int],
    vals: Seq[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var vi = 0
    val m = scala.collection.mutable.Map[Int, (Int, Int)]()
    for (l <- 1 to 16) {
      for (_ <- 0 until counts(l - 1)) {
        m(vals(vi)) = (code, l); code += 1; vi += 1
      }
      code <<= 1
    }
    m.toMap
  }

  private class JBitWriter {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def bit(v: Int): Unit = {
      acc = (acc << 1) | (v & 1)
      n += 1
      if (n == 8) {
        out.write(acc)
        if (acc == 0xff) out.write(0x00) // byte stuffing
        acc = 0; n = 0
      }
    }
    def bits(v: Int, w: Int): Unit = {
      var k = w - 1
      while (k >= 0) { bit((v >> k) & 1); k -= 1 }
    }
    def align(): Unit = while (n != 0) bit(1) // 1-fill padding
    def raw(b: Int): Unit = { require(n == 0); out.write(b) }
  }

  private def magCat(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Entropy-encode one zigzag block; returns the new DC predictor. */
  private def encodeBlock(w: JBitWriter, zz: Array[Int], pred: Int,
    dc: Map[Int, (Int, Int)], ac: Map[Int, (Int, Int)]): Int = {
    val diff = zz(0) - pred
    val s = magCat(diff)
    val (c0, l0) = dc(s)
    w.bits(c0, l0)
    if (s > 0)
      w.bits(if (diff >= 0) diff else (diff - 1) & ((1 << s) - 1), s)
    var k = 1
    var run = 0
    while (k < 64) {
      if (zz(k) == 0) run += 1
      else {
        while (run >= 16) {
          val (zc, zl) = ac(0xf0); w.bits(zc, zl); run -= 16
        }
        val sz = magCat(zz(k))
        val (cc, ll) = ac((run << 4) | sz)
        w.bits(cc, ll)
        w.bits(if (zz(k) >= 0) zz(k) else (zz(k) - 1) & ((1 << sz) - 1), sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, el) = ac(0x00); w.bits(ec, el) }
    zz(0)
  }

  private val dcCountsDflt = Seq(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val dcValsDflt = 0 to 11
  private val acCountsDflt = Seq(0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val acValsDflt = Seq(0x00, 0x01, 0x02, 0x03, 0x04, 0x05, 0x06,
    0x07, 0x08, 0x09, 0x0a, 0xf0, 0x11, 0x21, 0x31, 0x12)

  /** Minimal baseline JPEG writer. `blocks(c)` holds component c's
    * zigzag coefficient blocks in MCU-emission order (per MCU:
    * components in order, V-major then H within a component).
    */
  private def jpegReal(w: Int, h: Int, comps: Seq[(Int, Int)],
    qt: Array[Int], blocks: Seq[Seq[Array[Int]]], dri: Int = 0,
    dcCounts: Seq[Int] = dcCountsDflt, dcVals: Seq[Int] = dcValsDflt,
    sofMarker: Int = 0xc0): Array[Byte] = {
    val dc = huffAssign(dcCounts, dcVals)
    val ac = huffAssign(acCountsDflt, acValsDflt)
    val bb = new java.io.ByteArrayOutputStream()
    def word(v: Int): Unit = { bb.write((v >> 8) & 0xff); bb.write(v & 0xff) }
    def marker(m: Int): Unit = { bb.write(0xff); bb.write(m) }
    marker(0xd8) // SOI
    marker(0xdb); word(2 + 65); bb.write(0x00) // DQT table 0
    qt.foreach(bb.write)
    marker(sofMarker); word(8 + 3 * comps.length)
    bb.write(8); word(h); word(w); bb.write(comps.length)
    comps.zipWithIndex.foreach { case ((ch, cv), k) =>
      bb.write(k + 1); bb.write((ch << 4) | cv); bb.write(0)
    }
    def dht(tc: Int, counts: Seq[Int], vals: Seq[Int]): Unit = {
      marker(0xc4); word(2 + 17 + vals.length)
      bb.write(tc << 4)
      counts.foreach(bb.write)
      vals.foreach(bb.write)
    }
    dht(0, dcCounts, dcVals)
    dht(1, acCountsDflt, acValsDflt)
    if (dri > 0) { marker(0xdd); word(4); word(dri) }
    marker(0xda); word(6 + 2 * comps.length)
    bb.write(comps.length)
    comps.indices.foreach { k => bb.write(k + 1); bb.write(0x00) }
    bb.write(0); bb.write(63); bb.write(0) // Ss/Se/AhAl
    // entropy-coded MCU interleave with restart intervals
    val hmax = comps.map(_._1).max
    val vmax = comps.map(_._2).max
    val mcus = ((w + 8 * hmax - 1) / (8 * hmax)) *
      ((h + 8 * vmax - 1) / (8 * vmax))
    val wtr = new JBitWriter
    val preds = Array.fill(comps.length)(0)
    val queues = blocks.map(_.iterator)
    var rst = 0
    var since = 0
    for (mcu <- 0 until mcus) {
      if (dri > 0 && since == dri) {
        wtr.align()
        wtr.raw(0xff); wtr.raw(0xd0 | rst)
        rst = (rst + 1) & 7
        since = 0
        java.util.Arrays.fill(preds, 0)
      }
      for (((ch, cv), c) <- comps.zipWithIndex; _ <- 0 until ch * cv)
        preds(c) = encodeBlock(wtr, queues(c).next(), preds(c), dc, ac)
      since += 1
    }
    wtr.align()
    bb.write(wtr.out.toByteArray)
    marker(0xd9) // EOI
    bb.toByteArray
  }

  /** Reference IDCT (A.3.3), written directly from the formula with
    * math.cos — independent of the decoder's tabulated transform.
    */
  private def refIdct(natural: Array[Int]): Array[Int] =
    Array.tabulate(64) { p =>
      val x = p % 8; val y = p / 8
      var s = 0.0
      for (v <- 0 until 8; uu <- 0 until 8) {
        val cu = if (uu == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        s += cu * cv * natural(v * 8 + uu) *
          math.cos((2 * x + 1) * uu * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      }
      val r = math.round(s / 4.0).toInt + 128
      math.max(0, math.min(255, r))
    }

  private def flatQt: Array[Int] = Array.fill(64)(1)

  test("jpegPixels decodes a DC-only grayscale block with " +
    "dequantization to the exact flat value") {
    val qt = flatQt; qt(0) = 2
    val zz = new Array[Int](64); zz(0) = 16 // dequant → 32 → 32/8+128
    val img = jpegReal(8, 8, Seq((1, 1)), qt, Seq(Seq(zz)))
    val r = MediaHeaders.jpegPixels(img).get
    assert(r.width == 8 && r.height == 8)
    assert(r.pixels.forall(_ == 0x848484)) // gray 132
  }

  test("jpegPixels reproduces the reference IDCT exactly for an AC " +
    "cosine pattern") {
    val zz = new Array[Int](64); zz(1) = 50 // zigzag 1 = basis (u=1,v=0)
    val img = jpegReal(8, 8, Seq((1, 1)), flatQt, Seq(Seq(zz)))
    val natural = new Array[Int](64)
    for (k <- 0 until 64) natural(testZigzag(k)) = zz(k)
    val want = refIdct(natural).map(g => (g << 16) | (g << 8) | g)
    assert(MediaHeaders.jpegPixels(img).get.pixels.toSeq == want.toSeq)
  }

  test("jpegPixels decodes 4:2:0 YCbCr with chroma upsampling to " +
    "exact per-quadrant colors") {
    // 16×16, Y at 2×2 sampling (4 blocks), flat Cb/Cr — DC-only
    // blocks so every quadrant color has a closed form
    def dcOnly(level: Int): Array[Int] = {
      val a = new Array[Int](64); a(0) = (level - 128) * 8; a
    }
    val yLevels = Seq(60, 120, 180, 240) // TL TR BL BR
    val img = jpegReal(16, 16, Seq((2, 2), (1, 1), (1, 1)), flatQt,
      Seq(yLevels.map(dcOnly), Seq(dcOnly(100)), Seq(dcOnly(200))))
    val r = MediaHeaders.jpegPixels(img).get
    assert(r.width == 16 && r.height == 16)
    def jfif(yy: Int, cb: Int, cr: Int): Int = {
      def cl(d: Double) = math.max(0, math.min(255, math.round(d).toInt))
      (cl(yy + 1.402 * (cr - 128)) << 16) |
        (cl(yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)) << 8) |
        cl(yy + 1.772 * (cb - 128))
    }
    val want = yLevels.map(jfif(_, 100, 200))
    for (y <- 0 until 16; x <- 0 until 16) {
      val q = (y / 8) * 2 + (x / 8)
      assert(r.pixels(y * 16 + x) == want(q),
        s"($x,$y) quadrant $q")
    }
  }

  test("jpegPixels honors restart intervals: DC predictors reset at " +
    "RSTn") {
    // 16×8 gray = 2 MCUs, DRI=1 → RST0 between them. The second
    // block's stored DC is its diff from a RESET predictor — a
    // decoder that fails to reset shows 145 instead of 129.
    def dc(v: Int) = { val a = new Array[Int](64); a(0) = v; a }
    val img = jpegReal(16, 8, Seq((1, 1)), flatQt,
      Seq(Seq(dc(40), dc(8))), dri = 1)
    val r = MediaHeaders.jpegPixels(img).get
    for (y <- 0 until 8; x <- 0 until 16)
      assert(r.pixels(y * 16 + x) ==
        (if (x < 8) 0x858585 else 0x818181), s"($x,$y)") // 133 / 129
  }

  test("jpegPixels unstuffs FF00 in the entropy stream") {
    // skewed unary-ish DC table puts category 8 at code 111111110;
    // diff 255 appends 8 more 1-bits → a raw 0xFF byte the encoder
    // must stuff and the decoder must unstuff
    val counts = Seq(1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    val dc = { val a = new Array[Int](64); a(0) = 255; a }
    val img = jpegReal(8, 8, Seq((1, 1)), flatQt, Seq(Seq(dc)),
      dcCounts = counts, dcVals = 0 to 8)
    val hasStuffing = img.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && p(1) == 0x00)
    assert(hasStuffing, "fixture must actually contain a stuffed byte")
    val r = MediaHeaders.jpegPixels(img).get
    assert(r.pixels.forall(_ == 0xa0a0a0)) // round(255/8)+128 = 160
  }

  test("jpegPixels rejects progressive and truncated streams instead " +
    "of emitting garbage") {
    val zz = new Array[Int](64); zz(0) = 16
    val prog = jpegReal(8, 8, Seq((1, 1)), flatQt, Seq(Seq(zz)),
      sofMarker = 0xc2)
    assert(MediaHeaders.jpegPixels(prog).isEmpty)
    val whole = jpegReal(8, 8, Seq((1, 1)), flatQt, Seq(Seq(zz)))
    assert(MediaHeaders.jpegPixels(whole.take(whole.length - 4)).isEmpty)
    // the header-only sniff fixture has no scan at all
    assert(MediaHeaders.jpegPixels(jpegBytes(800, 600)).isEmpty)
  }

  test("decodeContent in the Spark pipeline: real BMP/WAV samples, " +
    "stub fallback for entropy-coded payloads") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val pal = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    val pngReal = pngFile(2, 2, 3,
      filterRows(Array(0, 1, 2, 3), 2, 2, 1, Seq(0, 0)), pal)
    val gifReal = gifFile(2, 2, pal, 2,
      Seq((4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4)))
    val jpegGray = { // flat gray 132 via a DC-only baseline block
      val qt = flatQt; qt(0) = 2
      val zz = new Array[Int](64); zz(0) = 16
      jpegReal(8, 8, Seq((1, 1)), qt, Seq(Seq(zz)))
    }
    val media = Seq(
      (1L, bmpBytes), (2L, wavBytes), (3L, jpegBytes(800, 600)),
      (4L, pngReal), (5L, gifReal), (6L, jpegGray)
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
    // PNG and GIF pixels decode for REAL in the pipeline — same
    // raster, same checksum as the BMP that draws the same image
    assert(got(4L).format == "png" && got(4L).kind == "image" &&
      got(4L).n_samples == 4 &&
      got(4L).sample_checksum == got(1L).sample_checksum)
    assert(got(5L).format == "gif" && got(5L).kind == "image" &&
      got(5L).n_samples == 4 &&
      got(5L).sample_checksum == got(1L).sample_checksum)
    // baseline JPEG decodes for REAL too
    assert(got(6L).format == "jpeg" && got(6L).kind == "image" &&
      got(6L).n_samples == 64 &&
      got(6L).sample_checksum == ck(Seq.fill(64)(0x848484)))
    // a headers-only JPEG (no scan) is outside decoder coverage:
    // stub path, flagged as such, but the header dimensions are real
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

  test("nnResize center-samples exactly: a 2x2 raster becomes four 4x4 " +
    "quadrant blocks at 8x8") {
    val r = MediaHeaders.bmpPixels(bmpBytes).get
    val thumb = MultimodalOps.nnResize(r, 8, 8)
    val expected = (0 until 8).flatMap { y =>
      (0 until 8).map { x =>
        (if (y < 4) if (x < 4) 0xff0000 else 0x00ff00
         else if (x < 4) 0x0000ff else 0xffffff)
      }
    }
    assert(thumb.toSeq == expected)
  }

  test("image + audio feature extraction is value-exact on hand-built " +
    "containers") {
    def ck(vals: Seq[Int]): Long =
      vals.foldLeft(1125899906842597L)((a, v) => a * 31 + v)
    val img = MultimodalOps.imageFeats(1L, "bmp",
      MediaHeaders.bmpPixels(bmpBytes).get)
    // 2x2 pure red/green/blue/white: channel sum 255*3 + 765 = 1530
    assert(img.mean_intensity.contains(1530.0 / 12.0)) // = 127.5 exactly
    val expectedThumb = (0 until 8).flatMap { y =>
      (0 until 8).map { x =>
        (if (y < 4) if (x < 4) 0xff0000 else 0x00ff00
         else if (x < 4) 0x0000ff else 0xffffff)
      }
    }
    assert(img.thumb_ck.contains(ck(expectedThumb)))
    val aud = MultimodalOps.audioFeats(2L,
      MediaHeaders.wavSamples(wavBytes).get)
    // [0, 1000, -1000, 32767, -32768]: sign flips at i=2,3,4
    assert(aud.zcr.contains(3L))
    val ssq = 0L + 1000L * 1000 + 1000L * 1000 +
      32767L * 32767 + 32768L * 32768
    assert(aud.rms.contains(
      math.rint(math.sqrt(ssq.toDouble / 5) * 10000.0) / 10000.0))
  }

  test("wrapBmp / wrapWav synthesize REAL containers the decoders " +
    "round-trip byte-exactly") {
    val payload = Array.tabulate[Byte](96)(i => (i * 7 % 251).toByte)
    val r = MediaHeaders.bmpPixels(MultimodalOps.wrapBmp(payload)).get
    assert(r.width == 16 && r.height == 2)
    // bottom-up BMP: payload row 0 is the BOTTOM raster row; samples
    // are BGR in file order
    def px(row: Int, xx: Int): Int = {
      val i = row * 48 + xx * 3
      def u(b: Byte) = b & 0xff
      (u(payload(i + 2)) << 16) | (u(payload(i + 1)) << 8) | u(payload(i))
    }
    val expected = (0 until 16).map(px(1, _)) ++ (0 until 16).map(px(0, _))
    assert(r.pixels.toSeq == expected)
    val p = MediaHeaders.wavSamples(MultimodalOps.wrapWav(payload)).get
    assert(p.sampleRate == 8000 && p.channels == 1 && p.bits == 16)
    val expSamples = (0 until 48).map { k =>
      val lo = payload(2 * k) & 0xff
      val hi = payload(2 * k + 1)
      (hi << 8) | lo
    }
    assert(p.samples.toSeq == expSamples)
  }

  test("q_media_features runs the real encode→decode→resize→feature " +
    "path over the fixture: every 5th doc audio, the rest images, no " +
    "stub rows") {
    val rows = MultimodalOps.q_media_features(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 5 == 0) {
        assert(r.getString(2) == "audio" && r.getString(1) == "wav")
        assert(!r.isNullAt(7) && !r.isNullAt(8)) // zcr, rms
        assert(r.isNullAt(5) && r.isNullAt(6))
      } else {
        assert(r.getString(2) == "image" && r.getString(1) == "bmp")
        assert(!r.isNullAt(5) && !r.isNullAt(6)) // thumb_ck, mean
        assert(r.isNullAt(7) && r.isNullAt(8))
      }
    }
  }

  test("dhashHalves: pinned bits on a hand-built gradient grid, " +
    "invariant to brightness scale, sensitive to one flipped gradient") {
    // 9x8 grid, row-major: strictly decreasing across each row
    // ⇒ every gradient bit set ⇒ hi = lo = 0xffffffff
    val dec = Array.tabulate(72)(i => 80 - (i % 9) * 5)
    assert(MultimodalOps.dhashHalves(dec) == (0xffffffffL, 0xffffffffL))
    // strictly increasing ⇒ no bit set
    val inc = Array.tabulate(72)(i => (i % 9) * 5)
    assert(MultimodalOps.dhashHalves(inc) == (0L, 0L))
    // doubling every gray value changes nothing (comparisons only)
    assert(MultimodalOps.dhashHalves(dec.map(_ * 2)) ==
      MultimodalOps.dhashHalves(dec))
    // flipping ONE gradient cell (row 0, x=0: make g(0,0) < g(0,1))
    // clears exactly bit 0 of lo
    val oneFlip = dec.clone(); oneFlip(0) = 0
    assert(MultimodalOps.dhashHalves(oneFlip) ==
      (0xffffffffL, 0xfffffffeL))
  }

  test("q_media_dhash: pairs are ordered and hamming is within the " +
    "declared cap on the fixture") {
    val rows = MultimodalOps.q_media_dhash(spark, dir).collect()
    assert(rows.nonEmpty, "vacuous: the fixture must yield near-dup pairs")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val h = r.getLong(2)
      assert(h >= 0 && h <= MultimodalOps.dhashMaxHamming)
    }
  }

  test("dhashFrame: identical payloads hash identically (hamming-0 " +
    "discovery is guaranteed — equal hashes share all four bands); a " +
    "byte-reversed payload hashes differently") {
    import org.apache.spark.sql.functions._
    val payload = Array.tabulate[Byte](600)(i => ((i * 37 + 11) % 251).toByte)
    val media = Seq(
      (1L, MultimodalOps.wrapBmp(payload)),
      (2L, MultimodalOps.wrapBmp(payload)),
      (3L, MultimodalOps.wrapBmp(payload.reverse))
    ).toDF("doc_id", "content")
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val sig = MultimodalOps.dhashFrame(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sig.size == 3)
    assert(sig(1L) == sig(2L), "identical payloads must hash identically")
    assert(sig(1L) != sig(3L), "reversed payload must hash differently")
    // halves stay in the non-negative 32-bit convention
    sig.values.foreach { case (hi, lo) =>
      assert(hi >= 0L && hi <= 0xffffffffL && lo >= 0L && lo <= 0xffffffffL)
    }
  }
}
