package graft.operators

/** Baseline-sequential JPEG decoder — pure byte/bit arithmetic, no
  * codec library (ITU T.81: DQT/DHT/SOF0-1/DRI/SOS, canonical
  * Huffman per Annex C/F, EXTEND sign recovery, zigzag dequant,
  * 2-D IDCT, JFIF YCbCr→RGB with box chroma upsampling, restart
  * markers, FF00 byte unstuffing).
  *
  * Coverage is the dominant interchange layout: 8-bit precision,
  * Huffman entropy coding, sequential DCT (SOF0/SOF1), 1 or 3
  * components, sampling factors 1–4. Everything else — progressive
  * (SOF2), arithmetic coding, hierarchical, 12-bit — returns None
  * and the caller falls back ([[MultimodalOps.decodeStub]] marks the
  * row 'stub'), same contract as the other decoders in
  * [[MediaHeaders]].
  *
  * The IDCT is a table-driven double-precision direct transform:
  * exact to the reference cosine definition (A.3.3) and fully
  * deterministic across JVMs (strictfp-free doubles are fine — the
  * expression uses only +,* on table values). A production
  * deployment at 100 TB swaps in a codec library at the
  * `decodeContent` seam; this decoder is the honest dependency-free
  * floor, not a throughput claim.
  */
object JpegBaseline {
  import MediaHeaders.Raster

  /** Internal bail-out: any structural violation aborts to None. */
  private final class Bail extends RuntimeException(null, null, false, false)
  private def bail(): Nothing = throw new Bail

  private def u(x: Byte): Int = x & 0xff
  private def be2(b: Array[Byte], i: Int): Int = {
    if (i + 1 >= b.length) bail()
    (u(b(i)) << 8) | u(b(i + 1))
  }

  /** Zigzag index → natural (row-major) index, T.81 Figure A.6. */
  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cosTab(x)(u) = C(u)·cos((2x+1)uπ/16), the A.3.3 basis with the
    * 1/√2 DC normalization folded in.
    */
  private val cosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (x, um) =>
    val c = if (um == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * um * math.Pi / 16.0)
  }

  /** Canonical Huffman table (Annex C code assignment, F.2.2.3
    * decode): counts(i) = number of codes of length i+1, vals in
    * code order.
    */
  private final class Huff(counts: Array[Int], vals: Array[Int]) {
    private val maxcode = new Array[Int](17)
    private val mincode = new Array[Int](17)
    private val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) == 0) maxcode(l) = -1
        else {
          valptr(l) = k
          mincode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(r: BitReader): Int = {
      var code = r.bit()
      var l = 1
      while (maxcode(l) < code) { // F.16: extend until a length matches
        if (l >= 16) bail()
        code = (code << 1) | r.bit()
        l += 1
      }
      vals(valptr(l) + code - mincode(l))
    }
  }

  /** Entropy-segment bit reader: FF00 unstuffing; any real marker
    * ends the bit supply (position parks ON the FF so the MCU loop
    * can read RSTn).
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) bail()
        var v = u(b(pos))
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) bail()
          if (u(b(pos)) == 0x00) pos += 1 // stuffed data byte
          else { pos -= 1; bail() } // marker where data was expected
        }
        acc = v
        nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(expected: Int): Unit = {
      nbits = 0
      if (pos + 1 >= b.length || u(b(pos)) != 0xff ||
        u(b(pos + 1)) != (0xd0 | expected)) bail()
      pos += 2
    }
  }

  /** F.2.2.1 EXTEND: map an n-bit magnitude to its signed value. */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Huff = null
    var acTable: Huff = null
    var pred: Int = 0
    var plane: Array[Int] = null
    var pw: Int = 0
    var ph: Int = 0
  }

  def decode(b: Array[Byte]): Option[Raster] = {
    if (b == null || b.length < 4 || u(b(0)) != 0xff || u(b(1)) != 0xd8)
      return None
    try Some(run(b))
    catch { case _: Bail | _: ArrayIndexOutOfBoundsException => None }
  }

  private def run(b: Array[Byte]): Raster = {
    val qtables = new Array[Array[Int]](4) // zigzag order
    val dcTables = new Array[Huff](4)
    val acTables = new Array[Huff](4)
    var comps: Array[Component] = null
    var w = 0
    var h = 0
    var dri = 0
    var i = 2
    while (true) {
      if (i >= b.length || u(b(i)) != 0xff) bail()
      // tolerate FF fill bytes before the marker code (B.1.1.2)
      while (i < b.length && u(b(i)) == 0xff) i += 1
      if (i >= b.length) bail()
      val m = u(b(i))
      i += 1
      m match {
        case 0xdb => // DQT: one or more tables
          val end = i + be2(b, i)
          i += 2
          while (i < end) {
            val pq = u(b(i)) >> 4
            val tq = u(b(i)) & 15
            if (pq != 0 || tq > 3 || i + 65 > end) bail() // 8-bit only
            qtables(tq) = Array.tabulate(64)(k => u(b(i + 1 + k)))
            i += 65
          }
          if (i != end) bail()
        case 0xc4 => // DHT: one or more tables
          val end = i + be2(b, i)
          i += 2
          while (i < end) {
            val tc = u(b(i)) >> 4
            val th = u(b(i)) & 15
            if (tc > 1 || th > 3 || i + 17 > end) bail()
            val counts = Array.tabulate(16)(k => u(b(i + 1 + k)))
            val n = counts.sum
            if (n == 0 || n > 256 || i + 17 + n > end) bail()
            val vals = Array.tabulate(n)(k => u(b(i + 17 + k)))
            val t = new Huff(counts, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            i += 17 + n
          }
          if (i != end) bail()
        case 0xc0 | 0xc1 => // baseline / extended-sequential Huffman
          val end = i + be2(b, i)
          i += 2
          if (u(b(i)) != 8) bail() // precision
          h = be2(b, i + 1)
          w = be2(b, i + 3)
          val nc = u(b(i + 5))
          if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) bail()
          comps = Array.tabulate(nc) { k =>
            val o = i + 6 + 3 * k
            val hv = u(b(o + 1))
            val ch = hv >> 4
            val cv = hv & 15
            if (ch < 1 || ch > 4 || cv < 1 || cv > 4 || u(b(o + 2)) > 3)
              bail()
            Component(u(b(o)), ch, cv, u(b(o + 2)))
          }
          i = end
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          bail() // progressive / arithmetic / hierarchical / lossless
        case 0xdd => // DRI
          if (be2(b, i) != 4) bail()
          dri = be2(b, i + 2)
          i += 4
        case 0xda => // SOS — decode the single sequential scan
          if (comps == null) bail()
          val end = i + be2(b, i)
          val ns = u(b(i + 2))
          if (ns != comps.length) bail() // non-interleaved: unsupported
          var k = 0
          while (k < ns) {
            val cs = u(b(i + 3 + 2 * k))
            val tt = u(b(i + 4 + 2 * k))
            val comp = comps.find(_.id == cs).getOrElse(bail())
            comp.dcTable = dcTables(tt >> 4)
            comp.acTable = acTables(tt & 15)
            if (comp.dcTable == null || comp.acTable == null ||
              qtables(comp.tq) == null) bail()
            k += 1
          }
          i = end
          return decodeScan(b, i, w, h, comps, qtables, dri)
        case 0xd9 => bail() // EOI before any scan
        case mm if mm >= 0xe0 && mm <= 0xef => i += be2(b, i) // APPn
        case 0xfe => i += be2(b, i) // COM
        case _ => // any other length-bearing segment
          val len = be2(b, i)
          if (len < 2) bail()
          i += len
      }
    }
    bail() // unreachable
  }

  private def decodeScan(b: Array[Byte], sosEnd: Int, w: Int, h: Int,
    comps: Array[Component], qtables: Array[Array[Int]],
    dri: Int): Raster = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    comps.foreach { c =>
      c.pw = mcusX * 8 * c.h
      c.ph = mcusY * 8 * c.v
      c.plane = new Array[Int](c.pw * c.ph)
      c.pred = 0
    }
    // cap pathological headers before allocating further
    if (comps.map(c => c.pw.toLong * c.ph).sum > (1L << 28)) bail()
    val r = new BitReader(b, sosEnd)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    var rst = 0
    var sinceRestart = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (dri > 0 && sinceRestart == dri) {
          r.restart(rst)
          rst = (rst + 1) & 7
          sinceRestart = 0
          comps.foreach(_.pred = 0)
        }
        comps.foreach { c =>
          val qt = qtables(c.tq)
          var bv = 0
          while (bv < c.v) {
            var bh = 0
            while (bh < c.h) {
              decodeBlock(r, c, qt, coef, block)
              // place the 8×8 block into the component plane
              val px = (mx * c.h + bh) * 8
              val py = (my * c.v + bv) * 8
              var y = 0
              while (y < 8) {
                System.arraycopy(block, y * 8, c.plane,
                  (py + y) * c.pw + px, 8)
                y += 1
              }
              bh += 1
            }
            bv += 1
          }
        }
        sinceRestart += 1
        mx += 1
      }
      my += 1
    }
    assemble(w, h, comps, hmax, vmax)
  }

  /** One 8×8 block: DC diff + AC run-lengths (F.2.2), dequant through
    * the zigzag, IDCT, level shift, clamp.
    */
  private def decodeBlock(r: BitReader, c: Component, qt: Array[Int],
    coef: Array[Int], out: Array[Int]): Unit = {
    java.util.Arrays.fill(coef, 0)
    val t = c.dcTable.decode(r)
    if (t > 11) bail()
    c.pred += extend(r.receive(t), t)
    coef(0) = c.pred * qt(0)
    var k = 1
    while (k < 64) {
      val rs = c.acTable.decode(r)
      val run = rs >> 4
      val size = rs & 15
      if (size == 0) {
        if (run == 15) k += 16 // ZRL: sixteen zeros
        else k = 64 // EOB
      } else {
        k += run
        if (k > 63) bail()
        coef(zigzag(k)) = extend(r.receive(size), size) * qt(k)
        k += 1
      }
    }
    // direct 2-D IDCT (A.3.3) over the dequantized coefficients
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cy = cosTab(y)(v)
          var um = 0
          while (um < 8) {
            val f = coef(v * 8 + um)
            if (f != 0) s += cy * cosTab(x)(um) * f
            um += 1
          }
          v += 1
        }
        val p = math.round(s / 4.0).toInt + 128
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  /** Planes → packed RGB raster: box chroma upsampling (integer
    * sample-index mapping), JFIF color transform for 3 components,
    * gray replication for 1.
    */
  private def assemble(w: Int, h: Int, comps: Array[Component],
    hmax: Int, vmax: Int): Raster = {
    val out = new Array[Int](w * h)
    def sample(c: Component, x: Int, y: Int): Int =
      c.plane((y * c.v / vmax) * c.pw + (x * c.h / hmax))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb =
          if (comps.length == 1) {
            val g = sample(comps(0), x, y)
            (g << 16) | (g << 8) | g
          } else {
            val yy = sample(comps(0), x, y).toDouble
            val cb = sample(comps(1), x, y) - 128.0
            val cr = sample(comps(2), x, y) - 128.0
            def clamp(d: Double): Int = {
              val v = math.round(d).toInt
              if (v < 0) 0 else if (v > 255) 255 else v
            }
            (clamp(yy + 1.402 * cr) << 16) |
              (clamp(yy - 0.344136 * cb - 0.714136 * cr) << 8) |
              clamp(yy + 1.772 * cb)
          }
        out(y * w + x) = rgb
        x += 1
      }
      y += 1
    }
    Raster(w, h, out)
  }
}
