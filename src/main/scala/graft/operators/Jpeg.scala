package graft.operators

/** Pure-JVM baseline JPEG (ITU-T T.81 sequential DCT, SOF0) — the last
  * of the three dominant web image formats to get FULL pixel decode
  * (PNG proved the Inflater pattern, GIF the LZW pattern; JPEG needs
  * Huffman entropy decode + IDCT, both implemented here from the public
  * spec, no codec library).
  *
  * Encoder — fixture-grade but REAL: writes a valid interleaved
  * baseline stream (SOI, APP0, DQT×2, SOF0, DHT×4, optional DRI, SOS,
  * entropy-coded segment with byte stuffing and restart markers, EOI)
  * from caller-supplied QUANTIZED zigzag coefficient blocks. Huffman
  * tables are generated canonically (all DC categories at one code
  * length, all 162 AC run/size symbols at one code length — valid
  * per §C.2 since the all-ones code stays unassigned, so 1-padding
  * can never alias a symbol).
  *
  * Decoder — general baseline: marker walk (DQT 8/16-bit, DHT, SOF0/1,
  * DRI, SOS), canonical Huffman decode per §F.2.2 (MINCODE/MAXCODE/
  * VALPTR), interleaved MCU scan with per-component DC prediction,
  * 0xFF00 unstuffing, RSTn handling, dequantization, inverse zigzag,
  * separable double-precision IDCT, level shift + clamp, nearest
  * chroma upsampling for subsampled components, BT.601 YCbCr→RGB.
  * Returns None on malformed input (progressive SOF2, missing tables,
  * truncated entropy data, coefficient overrun...).
  *
  * Scale: decode is a pure per-row map over the binary column —
  * embarrassingly parallel, no shuffle; the same 100 TB shape as the
  * PNG/GIF/TIFF pixel paths (operators/Multimodal.scala).
  */
object Jpeg {

  /** Natural-order index of the k-th zigzag coefficient (T.81 Fig. A.6). */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ---- generated canonical Huffman specs (encoder side) ----------------

  /** DC: 12 category symbols, all at code length 4 (12 ≤ 2⁴−1 keeps the
    * all-ones code free). Code for symbol s is simply s. */
  private val DcSymbols: Array[Int] = (0 to 11).toArray

  /** AC: EOB, ZRL and every (run,size) pair — 162 symbols, all at code
    * length 8 (162 ≤ 2⁸−1). Code = index in this list. */
  private val AcSymbols: Array[Int] = {
    val b = Array.newBuilder[Int]
    b += 0x00 // EOB
    b += 0xF0 // ZRL
    for (r <- 0 to 15; s <- 1 to 10) b += (r << 4) | s
    b.result()
  }

  private def huffSpec(symbols: Array[Int], len: Int): (Array[Int], Array[Int]) = {
    require(symbols.length < (1 << len), "all-ones code must stay unassigned")
    val bits = Array.fill(16)(0)
    bits(len - 1) = symbols.length
    (bits, symbols)
  }

  // ---- bit I/O with byte stuffing --------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nb = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nb += 1
        if (nb == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xFF) out.write(0x00) // §B.1.1.5 stuffing
          acc = 0; nb = 0
        }
        i -= 1
      }
    }
    /** Pad the current byte with 1-bits (§F.1.2.3). */
    def align(): Unit = if (nb > 0) put((1 << (8 - nb)) - 1, 8 - nb)
    def writeMarker(m: Int): Unit = { align(); out.write(0xFF); out.write(m) }
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  private final class Malformed extends RuntimeException

  private final class BitReader(data: Array[Byte], start: Int) {
    private var i = start
    private var acc = 0
    private var nb = 0
    /** Position of the next unread byte (for post-scan marker checks). */
    def pos: Int = i
    def bit(): Int = {
      if (nb == 0) {
        if (i >= data.length) throw new Malformed
        val b = data(i) & 0xff
        i += 1
        if (b == 0xFF) {
          if (i >= data.length) throw new Malformed
          val n = data(i) & 0xff
          if (n == 0x00) i += 1 // stuffed FF
          else throw new Malformed // marker inside entropy data
        }
        acc = b; nb = 8
      }
      nb -= 1
      (acc >>> nb) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker (§E.2.4). A
      * stuffed FF00 produced by 1-padding the final entropy byte is
      * skipped first (§F.1.2.3 padding + §B.1.1.5 stuffing). */
    def restart(expected: Int): Unit = {
      nb = 0
      while (i + 1 < data.length && (data(i) & 0xff) == 0xFF &&
        (data(i + 1) & 0xff) == 0x00) i += 2
      if (i + 1 >= data.length || (data(i) & 0xff) != 0xFF ||
        (data(i + 1) & 0xff) != (0xD0 | expected)) throw new Malformed
      i += 2
    }
  }

  // ---- canonical Huffman decode tables (§F.2.2.1) ----------------------

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // mincode/maxcode/valptr indexed by code length 1..16
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    private var code = 0
    private var k = 0
    for (l <- 1 to 16) {
      if (bits(l - 1) > 0) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = code - 1
      }
      code <<= 1
    }
    def decode(r: BitReader): Int = {
      var c = r.bit()
      var l = 1
      while (maxCode(l) < 0 || c > maxCode(l)) {
        c = (c << 1) | r.bit()
        l += 1
        if (l > 16) throw new Malformed
      }
      vals(valPtr(l) + c - minCode(l))
    }
  }

  /** §F.2.2.1 EXTEND: map an s-bit magnitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  // ---- encoder ---------------------------------------------------------

  /** Encode an interleaved baseline JPEG from quantized zigzag blocks.
    *
    * @param samp    per-component (h, v) sampling factors (1 or 3 comps)
    * @param quant   the two quant tables in zigzag order (luma, chroma)
    * @param qsel    per-component quant table selector
    * @param blocks  (comp, seq) → 64 quantized zigzag coefficients; seq
    *                counts blocks of that component in MCU scan order
    * @param restartInterval MCUs between RSTn markers; 0 = none
    */
  def encodeBaseline(w: Int, h: Int,
                     samp: Seq[(Int, Int)],
                     quant: Seq[Array[Int]],
                     qsel: Seq[Int],
                     blocks: (Int, Int) => Array[Int],
                     restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 65535 && h <= 65535)
    require(samp.length == 1 || samp.length == 3)
    val nc = samp.length
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    marker(0xD8) // SOI
    marker(0xE0); u16(16) // APP0/JFIF
    out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    for ((q, tq) <- quant.zipWithIndex) { // DQT, 8-bit precision
      marker(0xDB); u16(67); u8(tq)
      q.foreach(u8)
    }
    marker(0xC0); u16(8 + 3 * nc); u8(8) // SOF0
    u16(h); u16(w); u8(nc)
    for (c <- 0 until nc) {
      u8(c + 1); u8((samp(c)._1 << 4) | samp(c)._2); u8(qsel(c))
    }
    val (dcBits, dcVals) = huffSpec(DcSymbols, 4)
    val (acBits, acVals) = huffSpec(AcSymbols, 8)
    for ((cls, id, bits, vals) <- Seq(
      (0, 0, dcBits, dcVals), (1, 0, acBits, acVals),
      (0, 1, dcBits, dcVals), (1, 1, acBits, acVals))) {
      marker(0xC4); u16(19 + vals.length); u8((cls << 4) | id)
      bits.foreach(u8); vals.foreach(u8)
    }
    if (restartInterval > 0) { marker(0xDD); u16(4); u16(restartInterval) }
    marker(0xDA); u16(6 + 2 * nc); u8(nc) // SOS
    for (c <- 0 until nc) {
      val t = if (c == 0) 0 else 1
      u8(c + 1); u8((t << 4) | t)
    }
    u8(0); u8(63); u8(0)
    // entropy-coded segment
    val acCode = AcSymbols.zipWithIndex.toMap
    val bw = new BitWriter
    val hmax = samp.map(_._1).max
    val vmax = samp.map(_._2).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val pred = new Array[Int](nc)
    val seq = new Array[Int](nc)
    var rst = 0
    var mcu = 0
    while (mcu < mcusX * mcusY) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.writeMarker(0xD0 | rst)
        rst = (rst + 1) % 8
        java.util.Arrays.fill(pred, 0)
      }
      for (c <- 0 until nc; _ <- 0 until samp(c)._1 * samp(c)._2) {
        val zz = blocks(c, seq(c))
        seq(c) += 1
        require(zz.length == 64)
        val diff = zz(0) - pred(c)
        pred(c) = zz(0)
        val s = category(diff)
        bw.put(s, 4) // DC: code == symbol at length 4
        if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        var k = 1
        var run = 0
        while (k <= 63) {
          if (zz(k) == 0) run += 1
          else {
            while (run > 15) { bw.put(acCode(0xF0), 8); run -= 16 }
            val sz = category(zz(k))
            require(sz <= 10, "AC coefficient too large for baseline fixture")
            bw.put(acCode((run << 4) | sz), 8)
            bw.put(if (zz(k) >= 0) zz(k) else zz(k) + (1 << sz) - 1, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) bw.put(acCode(0x00), 8) // EOB
      }
      mcu += 1
    }
    out.write(bw.bytes)
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ---- decoder ---------------------------------------------------------

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int,
                                var td: Int = 0, var ta: Int = 0)

  private val idctCos: Array[Array[Double]] = {
    val m = Array.ofDim[Double](8, 8)
    for (u <- 0 until 8; x <- 0 until 8) {
      val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      m(u)(x) = c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
    }
    m
  }

  /** Separable IDCT of a natural-order coefficient block → 64 pixel
    * bytes (level-shifted +128, clamped). Double precision: DC-only
    * blocks with DC a multiple of 8 reconstruct bit-exactly. */
  private def idct(coef: Array[Int], outPx: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // rows: tmp(v, x) = Σ_u C(u) F(v,u) cos_u(x)
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += idctCos(u)(x) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) { // cols: f(y,x) = ¼ Σ_v C(v) tmp(v,x) cos_v(y)
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += idctCos(vv)(y) * tmp(vv * 8 + x); vv += 1 }
        val p = Math.round(s / 4.0 + 128.0).toInt
        outPx(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  /** Full baseline decode → (width, height, RGB bytes). None on any
    * malformed structure. */
  def decodePixels(data: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try decode0(data) catch { case _: Malformed | _: ArrayIndexOutOfBoundsException => None }

  private def decode0(data: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (data.length < 4 || (data(0) & 0xff) != 0xFF ||
      (data(1) & 0xff) != 0xD8) return None
    val quant = new Array[Array[Int]](4)
    val huffDC = new Array[HuffTable](4)
    val huffAC = new Array[HuffTable](4)
    var comps: Array[Comp] = null
    var w = 0
    var h = 0
    var restartInterval = 0
    var i = 2
    var scanStart = -1
    while (scanStart < 0) {
      if (i + 1 >= data.length) return None
      if ((data(i) & 0xff) != 0xFF) return None
      var m = data(i + 1) & 0xff
      while (m == 0xFF && i + 2 < data.length) { i += 1; m = data(i + 1) & 0xff }
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { i += 2 }
      else if (m == 0xD9) return None // EOI before SOS
      else {
        if (i + 3 >= data.length) return None
        val len = ((data(i + 2) & 0xff) << 8) | (data(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > data.length) return None
        val seg = i + 4
        val segEnd = i + 2 + len
        m match {
          case 0xDB => // DQT: one or more tables per segment
            var p = seg
            while (p < segEnd) {
              val pq = (data(p) & 0xff) >> 4
              val tq = data(p) & 0x0f
              if (tq > 3 || pq > 1) return None
              val n = if (pq == 0) 64 else 128
              if (p + 1 + n > segEnd) return None
              val q = new Array[Int](64)
              var k = 0
              while (k < 64) {
                q(k) =
                  if (pq == 0) data(p + 1 + k) & 0xff
                  else ((data(p + 1 + 2 * k) & 0xff) << 8) |
                    (data(p + 2 + 2 * k) & 0xff)
                k += 1
              }
              quant(tq) = q
              p += 1 + n
            }
          case 0xC4 => // DHT: one or more tables per segment
            var p = seg
            while (p < segEnd) {
              val cls = (data(p) & 0xff) >> 4
              val id = data(p) & 0x0f
              if (cls > 1 || id > 3 || p + 17 > segEnd) return None
              val bits = Array.tabulate(16)(k => data(p + 1 + k) & 0xff)
              val n = bits.sum
              if (n > 256 || p + 17 + n > segEnd) return None
              val vals = Array.tabulate(n)(k => data(p + 17 + k) & 0xff)
              val t = new HuffTable(bits, vals)
              if (cls == 0) huffDC(id) = t else huffAC(id) = t
              p += 17 + n
            }
          case 0xC0 | 0xC1 => // SOF0 baseline / SOF1 extended sequential
            if (comps != null || len < 11) return None
            if ((data(seg) & 0xff) != 8) return None // precision
            h = ((data(seg + 1) & 0xff) << 8) | (data(seg + 2) & 0xff)
            w = ((data(seg + 3) & 0xff) << 8) | (data(seg + 4) & 0xff)
            val nc = data(seg + 5) & 0xff
            if (w == 0 || h == 0 || (nc != 1 && nc != 3)) return None
            if (len != 8 + 3 * nc) return None
            comps = Array.tabulate(nc) { c =>
              val o = seg + 6 + 3 * c
              val cc = Comp(data(o) & 0xff, (data(o + 1) & 0xff) >> 4,
                data(o + 1) & 0x0f, data(o + 2) & 0xff)
              if (cc.h < 1 || cc.h > 4 || cc.v < 1 || cc.v > 4 || cc.tq > 3)
                return None
              cc
            }
          case 0xC2 => return None // progressive: not baseline
          case 0xDD =>
            if (len != 4) return None
            restartInterval = ((data(seg) & 0xff) << 8) | (data(seg + 1) & 0xff)
          case 0xDA =>
            if (comps == null) return None
            val ns = data(seg) & 0xff
            if (ns != comps.length || len != 6 + 2 * ns) return None
            for (k <- 0 until ns) {
              val cid = data(seg + 1 + 2 * k) & 0xff
              val tt = data(seg + 2 + 2 * k) & 0xff
              val comp = comps.find(_.id == cid).getOrElse(return None)
              comp.td = tt >> 4
              comp.ta = tt & 0x0f
            }
            // Ss/Se/Ah-Al must be 0/63/0 for sequential
            if ((data(segEnd - 3) & 0xff) != 0 ||
              (data(segEnd - 2) & 0xff) != 63 ||
              (data(segEnd - 1) & 0xff) != 0) return None
            scanStart = segEnd
          case _ => // APPn/COM/unknown: skip
        }
        if (scanStart < 0) i = segEnd
      }
    }
    // entropy-coded scan
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // full MCU-padded planes per component
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    val planes = comps.indices.map(c =>
      new Array[Byte](planeW(c) * planeH(c))).toArray
    for (c <- comps) {
      if (quant(c.tq) == null || huffDC(c.td) == null || huffAC(c.ta) == null)
        return None
    }
    val r = new BitReader(data, scanStart)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    var rst = 0
    var mcu = 0
    while (mcu < mcusX * mcusY) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        r.restart(rst)
        rst = (rst + 1) % 8
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = quant(c.tq)
        val dc = huffDC(c.td)
        val ac = huffAC(c.ta)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            val t = dc.decode(r)
            if (t > 11) throw new Malformed
            pred(ci) += extend(r.bits(t), t)
            coef(0) = pred(ci) * q(0)
            var k = 1
            var eob = false
            while (k <= 63 && !eob) {
              val rs = ac.decode(r)
              val run = rs >> 4
              val sz = rs & 0x0f
              if (sz == 0) {
                if (run == 15) k += 16 else eob = true
              } else {
                k += run
                if (k > 63) throw new Malformed
                coef(Zigzag(k)) = extend(r.bits(sz), sz) * q(k)
                k += 1
              }
            }
            idct(coef, px)
            val ox = (mx * c.h + bx) * 8
            val oy = (my * c.v + by) * 8
            val pw = planeW(ci)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(ci)((oy + yy) * pw + ox + xx) = px(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // compose RGB (nearest upsampling of subsampled components)
    val rgb = new Array[Byte](w * h * 3)
    if (comps.length == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = planes(0)(y * pw + x)
          val o = (y * w + x) * 3
          rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def sample(ci: Int): Int = {
            val c = comps(ci)
            val sx = x * c.h / hmax
            val sy = y * c.v / vmax
            planes(ci)(sy * planeW(ci) + sx) & 0xff
          }
          val yy = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          def clamp(d: Double): Byte = {
            val p = Math.round(d).toInt
            (if (p < 0) 0 else if (p > 255) 255 else p).toByte
          }
          val o = (y * w + x) * 3
          rgb(o) = clamp(yy + 1.402 * cr)
          rgb(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          rgb(o + 2) = clamp(yy + 1.772 * cb)
          x += 1
        }
        y += 1
      }
    }
    Some((w, h, rgb))
  }

  // ---- fixture encoder for the oracle query ----------------------------

  /** Oracle-exact fixture: a bw×bh-block 4:4:4 color JPEG where Y block
    * k (raster order) is the CONSTANT payload byte k mod len, Cb is
    * constant 128 and Cr constant 133, all quantizers 1. Constant
    * blocks are DC-only, DC = 8·(v−128) is a multiple of 8, so the
    * double IDCT reconstructs v bit-exactly; the fixed chroma offsets
    * make the BT.601 conversion land at exactly (v+7, v−4, v) per
    * pixel (fractions .01 and .43 — no rounding ties), so the DuckDB
    * oracle predicts per-channel sums in pure integer arithmetic while
    * the decode still runs the whole baseline path: Huffman, DC
    * prediction, stuffing, dequant, IDCT, color convert. */
  def encodePixels(bw: Int, bh: Int, payload: Array[Byte]): Array[Byte] = {
    require(bw > 0 && bh > 0 && payload.nonEmpty)
    val ones = Array.fill(64)(1)
    def dcOnly(dc: Int): Array[Int] = {
      val a = new Array[Int](64)
      a(0) = dc
      a
    }
    val cb = dcOnly(0) // 128 after level shift
    val cr = dcOnly(8 * 5) // 133
    encodeBaseline(8 * bw, 8 * bh, Seq((1, 1), (1, 1), (1, 1)),
      Seq(ones, ones), Seq(0, 1, 1),
      (c, seq) => c match {
        case 0 => dcOnly(8 * ((payload(seq % payload.length) & 0xff) - 128))
        case 1 => cb
        case _ => cr
      })
  }
}
