package graft.operators

/** REAL, dependency-free media decoding — everything that needs no
  * codec library, with plain byte arithmetic:
  *
  *  - header sniffing (container magic + fixed-offset dimension
  *    fields) for PNG (IHDR), JPEG (SOF0-3 scan), GIF (87a/89a), BMP
  *    (BITMAPINFOHEADER), WAV (RIFF/WAVE fmt — "dimensions" are
  *    sample rate × channels);
  *  - FULL sample decode for the uncompressed containers:
  *    [[bmpPixels]] (BI_RGB 24/32-bit rasters, row padding + row
  *    order handled) and [[wavSamples]] (8/16-bit PCM, RIFF chunk
  *    walk). Only entropy-coded pixel formats (JPEG/PNG/GIF) remain
  *    behind [[MultimodalOps.decodeStub]] — those genuinely need a
  *    codec library.
  *
  * Anything unrecognized → None, caller falls back.
  */
object MediaHeaders {

  final case class Sniffed(format: String, width: Int, height: Int)

  def sniff(b: Array[Byte]): Option[Sniffed] =
    if (b == null) None
    else png(b).orElse(jpeg(b)).orElse(gif(b)).orElse(bmp(b)).orElse(wav(b))

  private def u(x: Byte): Int = x & 0xff
  private def be2(b: Array[Byte], i: Int): Int = (u(b(i)) << 8) | u(b(i + 1))
  private def be4(b: Array[Byte], i: Int): Int =
    (u(b(i)) << 24) | (u(b(i + 1)) << 16) | (u(b(i + 2)) << 8) | u(b(i + 3))
  private def le2(b: Array[Byte], i: Int): Int = u(b(i)) | (u(b(i + 1)) << 8)
  private def le4(b: Array[Byte], i: Int): Int =
    u(b(i)) | (u(b(i + 1)) << 8) | (u(b(i + 2)) << 16) | (u(b(i + 3)) << 24)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    b.length >= i + s.length && s.indices.forall(k => u(b(i + k)) == s.charAt(k))

  /** 8-byte signature, then the IHDR chunk is mandatory-first: length
    * (4) + "IHDR" (4) + width (4 BE) + height (4 BE).
    */
  private def png(b: Array[Byte]): Option[Sniffed] =
    if (b.length >= 24 &&
      u(b(0)) == 0x89 && ascii(b, 1, "PNG") &&
      u(b(4)) == 0x0d && u(b(5)) == 0x0a && u(b(6)) == 0x1a && u(b(7)) == 0x0a &&
      ascii(b, 12, "IHDR"))
      Some(Sniffed("png", be4(b, 16), be4(b, 20)))
    else None

  /** SOI then marker segments; dimensions live in the first SOF0-SOF3
    * frame header (marker FF C0..C3, then len(2) precision(1)
    * height(2 BE) width(2 BE)). Skips other segments by their length
    * field; tolerates fill bytes (FF padding) before a marker.
    */
  private def jpeg(b: Array[Byte]): Option[Sniffed] = {
    if (b.length < 4 || u(b(0)) != 0xff || u(b(1)) != 0xd8) return None
    var i = 2
    while (i + 9 < b.length && u(b(i)) == 0xff) {
      var j = i
      while (j < b.length && u(b(j)) == 0xff) j += 1 // fill bytes
      if (j + 8 >= b.length) return None
      val marker = u(b(j))
      if (marker >= 0xc0 && marker <= 0xc3)
        return Some(Sniffed("jpeg", be2(b, j + 6), be2(b, j + 4)))
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i = j + 1
      else if (marker == 0xd9 || marker == 0xda) return None // EOS before SOF
      else i = j + 1 + be2(b, j + 1) // skip segment by its length
    }
    None
  }

  /** "GIF87a"/"GIF89a", logical screen width/height little-endian. */
  private def gif(b: Array[Byte]): Option[Sniffed] =
    if (b.length >= 10 && (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")))
      Some(Sniffed("gif", le2(b, 6), le2(b, 8)))
    else None

  /** "BM" + BITMAPINFOHEADER: width at 18, height at 22 (LE, height
    * may be negative for top-down rows — magnitude is the dimension).
    */
  private def bmp(b: Array[Byte]): Option[Sniffed] =
    if (b.length >= 26 && ascii(b, 0, "BM"))
      Some(Sniffed("bmp", le4(b, 18), math.abs(le4(b, 22))))
    else None

  /** "RIFF"…"WAVE" + "fmt " chunk at the canonical offset: channels
    * at 22 (LE2), sample rate at 24 (LE4) — reported as (rate, chans)
    * since audio has no pixel dimensions.
    */
  private def wav(b: Array[Byte]): Option[Sniffed] =
    if (b.length >= 28 && ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE") &&
      ascii(b, 12, "fmt "))
      Some(Sniffed("wav", le4(b, 24), le2(b, 22)))
    else None

  // ── full sample decode for the UNCOMPRESSED containers ───────────
  // BMP (BI_RGB 24/32-bit) and PCM WAV (8/16-bit) carry raw samples
  // behind fixed headers — decodable with plain byte arithmetic, no
  // codec library. Only entropy-coded formats (JPEG/PNG/GIF pixels)
  // genuinely need a codec and stay stubbed
  // (MultimodalOps.decodeStub).

  /** Decoded raster: packed 0xRRGGBB ints, row-major, TOP-DOWN
    * regardless of the file's row order.
    */
  final case class Raster(width: Int, height: Int, pixels: Array[Int])

  /** Uncompressed BMP pixel decode. Supports the dominant layout:
    * BITMAPINFOHEADER (size 40), BI_RGB (compression 0), 24- or
    * 32-bit. Pixel rows are 4-byte aligned and stored bottom-up
    * unless height is negative (top-down); samples are BGR(A) little
    * order. Returns None (caller falls back to header-only sniff) for
    * palettized/compressed/other-header variants.
    */
  def bmpPixels(b: Array[Byte]): Option[Raster] = {
    if (b == null || b.length < 54 || !ascii(b, 0, "BM")) return None
    val pixOff = le4(b, 10)
    if (le4(b, 14) != 40 || le4(b, 30) != 0) return None // header/BI_RGB
    val w = le4(b, 18)
    val rawH = le4(b, 22)
    val h = math.abs(rawH)
    val bpp = le2(b, 28)
    if (w <= 0 || h == 0 || (bpp != 24 && bpp != 32)) return None
    val bytesPP = bpp / 8
    val stride = ((w * bytesPP + 3) / 4) * 4 // rows pad to 4 bytes
    if (pixOff < 54 || pixOff.toLong + stride.toLong * h > b.length) return None
    val out = new Array[Int](w * h)
    var row = 0
    while (row < h) {
      // bottom-up files store the LAST raster row first
      val srcRow = if (rawH > 0) h - 1 - row else row
      val base = pixOff + srcRow * stride
      var x = 0
      while (x < w) {
        val i = base + x * bytesPP
        out(row * w + x) = (u(b(i + 2)) << 16) | (u(b(i + 1)) << 8) | u(b(i))
        x += 1
      }
      row += 1
    }
    Some(Raster(w, h, out))
  }

  /** Decoded PCM audio: interleaved samples normalized to signed Int
    * (16-bit kept as-is; 8-bit unsigned re-centered to signed).
    */
  final case class Pcm(sampleRate: Int, channels: Int, bits: Int,
    samples: Array[Int])

  /** PCM WAV sample decode. Walks the RIFF chunk list (fmt may be
    * followed by LIST/fact/etc before data — the canonical offset is
    * not guaranteed), requires audio format 1 (PCM) at 8 or 16 bits,
    * and decodes the data chunk: 16-bit signed LE, or 8-bit unsigned
    * re-centered by -128. Returns None for compressed/float formats
    * (caller falls back to the header-only sniff).
    */
  def wavSamples(b: Array[Byte]): Option[Pcm] = {
    if (b == null || b.length < 44 || !ascii(b, 0, "RIFF") ||
      !ascii(b, 8, "WAVE")) return None
    var fmt: Option[(Int, Int, Int)] = None // (rate, channels, bits)
    var i = 12
    while (i + 8 <= b.length) {
      val size = le4(b, i + 4)
      if (size < 0 || i + 8 + size > b.length) return None
      if (ascii(b, i, "fmt ")) {
        if (size < 16 || le2(b, i + 8) != 1) return None // PCM only
        fmt = Some((le4(b, i + 12), le2(b, i + 10), le2(b, i + 22)))
      } else if (ascii(b, i, "data")) {
        val (rate, chans, bits) = fmt.getOrElse(return None)
        if (bits != 8 && bits != 16) return None
        val n = size / (bits / 8)
        val out = new Array[Int](n)
        var k = 0
        while (k < n) {
          val p = i + 8 + k * (bits / 8)
          out(k) =
            if (bits == 16) (le2(b, p) << 16) >> 16 // sign-extend
            else u(b(p)) - 128
          k += 1
        }
        return Some(Pcm(rate, chans, bits, out))
      }
      i += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    None
  }
}
