package graft.operators

/** REAL, dependency-free media header decoding — the part of "decode"
  * that needs no codec library: container magic bytes + fixed-offset
  * dimension fields, readable with plain byte arithmetic. This
  * replaces the corresponding slice of [[MultimodalOps.decodeStub]]:
  * payloads in a recognized container get their TRUE dimensions; only
  * pixel/sample decoding (which genuinely needs a codec) remains
  * stubbed.
  *
  * Formats: PNG (IHDR), JPEG (SOF0-3 scan), GIF (87a/89a), BMP
  * (BITMAPINFOHEADER), WAV (RIFF/WAVE fmt — "dimensions" are sample
  * rate × channels). Anything else → None, caller falls back.
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
}
