package graft.operators

/** REAL, dependency-free media decoding — everything that needs no
  * external codec library, with plain byte arithmetic (plus the
  * JDK's built-in `java.util.zip.Inflater` for PNG's zlib stream):
  *
  *  - header sniffing (container magic + fixed-offset dimension
  *    fields) for PNG (IHDR), JPEG (SOF0-3 scan), GIF (87a/89a), BMP
  *    (BITMAPINFOHEADER), WAV (RIFF/WAVE fmt — "dimensions" are
  *    sample rate × channels);
  *  - FULL sample decode for BMP ([[bmpPixels]]: BI_RGB 24/32-bit
  *    rasters, row padding + row order), PCM WAV ([[wavSamples]]:
  *    8/16-bit, RIFF chunk walk), PNG ([[pngPixels]]: zlib inflate +
  *    all five scanline filters, 8-bit gray/RGB/palette/GA/RGBA,
  *    non-interlaced), and GIF ([[gifPixels]]: variable-width LZW,
  *    global/local color table, non-interlaced first frame). Only
  *    JPEG's entropy-coded pixel path remains behind
  *    [[MultimodalOps.decodeStub]] — Huffman+DCT genuinely wants a
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

  /** PNG pixel decode — the JDK's zlib `Inflater` plus pure byte
    * arithmetic, no codec library. Supports the dominant layout:
    * 8-bit depth, color types 0 (gray) / 2 (RGB) / 3 (palette) /
    * 4 (gray+alpha) / 6 (RGBA), non-interlaced, all five scanline
    * filters (None/Sub/Up/Average/Paeth), multiple IDAT chunks
    * concatenated. Alpha is dropped (the [[Raster]] contract is
    * packed 0xRRGGBB). Chunk CRCs are not verified — corrupt streams
    * surface as inflate errors or short output, both → None. Other
    * depths and Adam7 interlace → None (caller falls back to the
    * header-only sniff).
    */
  def pngPixels(b: Array[Byte]): Option[Raster] = {
    if (b == null || b.length < 45) return None
    if (!(u(b(0)) == 0x89 && ascii(b, 1, "PNG") && u(b(4)) == 0x0d &&
      u(b(5)) == 0x0a && u(b(6)) == 0x1a && u(b(7)) == 0x0a)) return None
    if (be4(b, 8) != 13 || !ascii(b, 12, "IHDR")) return None
    val w = be4(b, 16)
    val h = be4(b, 20)
    val depth = u(b(24))
    val colorType = u(b(25))
    val interlace = u(b(28))
    if (w <= 0 || h <= 0 || depth != 8 || interlace != 0) return None
    val channels = colorType match {
      case 0 | 3 => 1
      case 4     => 2
      case 2     => 3
      case 6     => 4
      case _     => return None
    }
    // chunk walk: collect PLTE, concatenate IDAT (len+type+data+crc)
    var palette: Array[Int] = null
    val idat = new java.io.ByteArrayOutputStream()
    var i = 33 // 8 signature + 25 IHDR chunk
    var done = false
    while (!done && i + 8 <= b.length) {
      val len = be4(b, i)
      if (len < 0 || i.toLong + 12 + len > b.length) return None
      if (ascii(b, i + 4, "PLTE")) {
        if (len % 3 != 0 || len == 0) return None
        palette = Array.tabulate(len / 3) { k =>
          (u(b(i + 8 + 3 * k)) << 16) | (u(b(i + 9 + 3 * k)) << 8) |
            u(b(i + 10 + 3 * k))
        }
      } else if (ascii(b, i + 4, "IDAT")) idat.write(b, i + 8, len)
      else if (ascii(b, i + 4, "IEND")) done = true
      i += 12 + len
    }
    if (colorType == 3 && palette == null) return None
    val stride = w * channels
    // raw scanlines: 1 filter-type byte + stride bytes per row
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // reconstruct: each filter is defined on the ORIGINAL bytes of
    // the left/up/up-left neighbors, so unfilter in place row-major
    val img = new Array[Byte](stride * h)
    val bpp = channels // bytes per pixel (8-bit depth)
    var row = 0
    while (row < h) {
      val ft = u(raw(row * (stride + 1)))
      if (ft > 4) return None
      val src = row * (stride + 1) + 1
      val dst = row * stride
      var x = 0
      while (x < stride) {
        val rv = u(raw(src + x))
        val a = if (x >= bpp) u(img(dst + x - bpp)) else 0
        val up = if (row > 0) u(img(dst - stride + x)) else 0
        val c = if (row > 0 && x >= bpp) u(img(dst - stride + x - bpp)) else 0
        val rec = ft match {
          case 0 => rv
          case 1 => rv + a
          case 2 => rv + up
          case 3 => rv + ((a + up) >> 1)
          case _ => // Paeth predictor
            val p = a + up - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            rv + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
        }
        img(dst + x) = rec.toByte
        x += 1
      }
      row += 1
    }
    val out = new Array[Int](w * h)
    var p = 0
    while (p < out.length) {
      val base = p * channels
      out(p) = colorType match {
        case 0 | 4 =>
          val g = u(img(base)); (g << 16) | (g << 8) | g
        case 3 =>
          val idx = u(img(base))
          if (idx >= palette.length) return None
          palette(idx)
        case _ => // 2 (RGB) and 6 (RGBA): alpha dropped
          (u(img(base)) << 16) | (u(img(base + 1)) << 8) | u(img(base + 2))
      }
      p += 1
    }
    Some(Raster(w, h, out))
  }

  /** JPEG pixel decode — baseline-sequential Huffman DCT, pure code
    * ([[JpegBaseline]]): DQT/DHT/SOF0-1/DRI/SOS, FF00 unstuffing,
    * restart markers, zigzag dequant, 2-D IDCT, JFIF YCbCr→RGB with
    * box chroma upsampling. Progressive / arithmetic / 12-bit
    * layouts → None (caller falls back to the header-only sniff).
    */
  def jpegPixels(b: Array[Byte]): Option[Raster] = JpegBaseline.decode(b)

  /** GIF pixel decode — pure-code variable-width LZW, no codec
    * library. Decodes the FIRST image frame: global or local color
    * table, extension blocks skipped, non-interlaced only (Adam-free
    * row order; interlaced frames → None, caller falls back). The
    * transparency extension is ignored — the [[Raster]] contract is
    * packed opaque 0xRRGGBB.
    */
  def gifPixels(b: Array[Byte]): Option[Raster] = {
    if (b == null || b.length < 14) return None
    if (!(ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a"))) return None
    val packed = u(b(10))
    var i = 13
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (i + 3 * n > b.length) return None
      gct = Array.tabulate(n) { k =>
        (u(b(i + 3 * k)) << 16) | (u(b(i + 3 * k + 1)) << 8) |
          u(b(i + 3 * k + 2))
      }
      i += 3 * n
    }
    while (i < b.length) {
      u(b(i)) match {
        case 0x21 => // extension block: label byte, then sub-blocks
          i += 2
          while (i < b.length && u(b(i)) != 0) i += 1 + u(b(i))
          i += 1 // block terminator
        case 0x2c => // image descriptor
          if (i + 10 > b.length) return None
          val w = le2(b, i + 5)
          val h = le2(b, i + 7)
          val ip = u(b(i + 9))
          i += 10
          var ct = gct
          if ((ip & 0x80) != 0) { // local color table wins
            val n = 2 << (ip & 7)
            if (i + 3 * n > b.length) return None
            ct = Array.tabulate(n) { k =>
              (u(b(i + 3 * k)) << 16) | (u(b(i + 3 * k + 1)) << 8) |
                u(b(i + 3 * k + 2))
            }
            i += 3 * n
          }
          if (ct == null || (ip & 0x40) != 0 || w <= 0 || h <= 0)
            return None // no palette / interlaced
          if (i >= b.length) return None
          val minCode = u(b(i)); i += 1
          val data = new java.io.ByteArrayOutputStream()
          while (i < b.length && u(b(i)) != 0) { // data sub-blocks
            val n = u(b(i))
            if (i + 1 + n > b.length) return None
            data.write(b, i + 1, n)
            i += 1 + n
          }
          val idx = lzwDecode(data.toByteArray, minCode, w * h) match {
            case Some(v) => v
            case None    => return None
          }
          val out = new Array[Int](w * h)
          var p = 0
          while (p < out.length) {
            if (idx(p) >= ct.length) return None
            out(p) = ct(idx(p))
            p += 1
          }
          return Some(Raster(w, h, out))
        case 0x3b => return None // trailer before any image frame
        case _    => return None
      }
    }
    None
  }

  /** GIF-variant LZW: codes LSB-first, width grows from
    * minCodeSize+1 up to 12 bits as the dictionary fills, clear code
    * resets, KwKwK (code == next dict slot) handled. Returns exactly
    * `nPixels` color-table indices or None.
    */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
    nPixels: Int): Option[Array[Int]] = {
    if (minCodeSize < 2 || minCodeSize > 8) return None
    val clear = 1 << minCodeSize
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val stack = new Array[Int](4097)
    val out = new Array[Int](nPixels)
    var outLen = 0
    var dictSize = end + 1
    var codeSize = minCodeSize + 1
    var prev = -1
    var first = 0
    var bitPos = 0
    val totalBits = data.length * 8
    while (outLen < nPixels) {
      if (bitPos + codeSize > totalBits) return None
      var code = 0
      var k = 0
      while (k < codeSize) { // LSB-first bit order
        code |= ((u(data((bitPos + k) >> 3)) >> ((bitPos + k) & 7)) & 1) << k
        k += 1
      }
      bitPos += codeSize
      if (code == clear) {
        dictSize = end + 1
        codeSize = minCodeSize + 1
        prev = -1
      } else if (code == end) {
        return None // end-of-information before the raster filled
      } else {
        var sp = 0
        var c = code
        if (code >= dictSize) { // KwKwK: string(prev) + firstChar
          if (code != dictSize || prev < 0) return None
          stack(sp) = first
          sp += 1
          c = prev
        }
        while (c > end) { // expand dictionary entry to its root
          stack(sp) = suffix(c)
          sp += 1
          c = prefix(c)
        }
        if (c >= clear) return None // root must be a literal index
        first = c
        stack(sp) = c
        sp += 1
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = first
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
        while (sp > 0) { // stack unwinds root-first
          sp -= 1
          if (outLen < nPixels) { out(outLen) = stack(sp); outLen += 1 }
        }
      }
    }
    Some(out)
  }

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
