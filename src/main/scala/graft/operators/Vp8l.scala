package graft.operators

import scala.collection.mutable.ArrayBuffer

/** WebP lossless (VP8L) — a REAL pixel codec in pure JVM, closing the
  * "dims only" WebP gap the way GIF/TIFF closed: the container's
  * self-contained lossless bitstream (canonical prefix codes as in
  * DEFLATE, LZ77 backreferences, a color cache, and the
  * subtract-green transform) decoded byte-for-byte, and an encoder
  * producing the same subset so the round trip is exact.
  *
  * Bit order: VP8L packs bits LSB-first within bytes; prefix codes
  * are canonical (RFC 1951 style) and read MSB-of-code-first through
  * that stream — both directions implemented here.
  *
  * Honest subset (documented, decode returns None outside it):
  *  - transforms: SUBTRACT_GREEN (type 2) only; PREDICTOR / COLOR /
  *    COLOR_INDEXING streams are rejected, not mis-decoded
  *  - no meta-prefix (entropy image) support — single code group
  *  - LZ77 distance codes ≤ 120 (the 2-D neighbor map) are rejected;
  *    the direct codes (> 120) that this encoder emits decode fully
  * JDK ImageIO cannot read or write WebP, so validation is the exact
  * encoder↔decoder round trip plus hand-pinned bitstreams
  * (Vp8lSpec) and the container fuzz walk (never throws).
  *
  * No reference analogue (north-star multimodal surface); the layout
  * is the public "WebP Lossless Bitstream Specification". */
object Vp8l {

  // ── LSB-first bit I/O ───────────────────────────────────────────

  private final class BitReader(data: Array[Byte], start: Int) {
    private var pos = start
    private var bit = 0
    var fail = false
    def u(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        if (pos >= data.length) { fail = true; return -1 }
        v |= ((data(pos) >> bit) & 1) << k
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        k += 1
      }
      v
    }
  }

  private final class BitWriter {
    private val buf = ArrayBuffer.empty[Byte]
    private var acc = 0
    private var nb = 0
    def u(v: Int, n: Int): Unit = {
      var k = 0
      while (k < n) {
        acc |= ((v >> k) & 1) << nb
        nb += 1
        if (nb == 8) { buf += acc.toByte; acc = 0; nb = 0 }
        k += 1
      }
    }
    /** A prefix code: its bits go out MSB-of-code first. */
    def code(c: Int, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) { u((c >> k) & 1, 1); k -= 1 }
    }
    def result(): Array[Byte] = {
      if (nb > 0) { buf += acc.toByte; acc = 0; nb = 0 }
      buf.toArray
    }
  }

  // ── canonical prefix codes ──────────────────────────────────────

  /** Bit-by-bit decode tree; `single >= 0` is the 0-bit one-symbol
    * code (simple-code form), read without consuming bits. */
  private final class Huff {
    private val child = ArrayBuffer[Int](0, 0)
    var single: Int = -1
    def insert(sym: Int, code: Int, len: Int): Boolean = {
      var node = 0
      var k = len - 1
      while (k >= 0) {
        val idx = node * 2 + ((code >> k) & 1)
        if (k == 0) {
          if (child(idx) != 0) return false
          child(idx) = -sym - 1
        } else {
          var nxt = child(idx)
          if (nxt < 0) return false
          if (nxt == 0) {
            nxt = child.size / 2
            child(idx) = nxt
            child += 0; child += 0
          }
          node = nxt
        }
        k -= 1
      }
      true
    }
    def read(r: BitReader): Int = {
      if (single >= 0) return single
      var node = 0
      while (true) {
        val b = r.u(1)
        if (b < 0) return -1
        val v = child(node * 2 + b)
        if (v < 0) return -v - 1
        if (v == 0) return -1
        node = v
      }
      -1
    }
  }

  /** Canonical tree from a length array: DEFLATE code assignment
    * (increasing length, then symbol index), Kraft-complete required
    * except the degenerate one-symbol tree (read as 0 bits, the
    * simple-code semantics libwebp also applies). */
  private def buildHuff(lens: Array[Int]): Option[Huff] = {
    var nUsed = 0
    var onlySym = -1
    var maxL = 0
    var i = 0
    while (i < lens.length) {
      val l = lens(i)
      if (l < 0 || l > 15) return None
      if (l > 0) { nUsed += 1; onlySym = i; if (l > maxL) maxL = l }
      i += 1
    }
    if (nUsed == 0) return None
    val h = new Huff
    if (nUsed == 1) { h.single = onlySym; return Some(h) }
    val blCount = new Array[Int](maxL + 1)
    lens.foreach(l => if (l > 0) blCount(l) += 1)
    var kraft = 0L
    for (l <- 1 to maxL) kraft += blCount(l).toLong << (maxL - l)
    if (kraft != (1L << maxL)) return None
    val nextCode = new Array[Int](maxL + 1)
    var c = 0
    for (l <- 1 to maxL) {
      c = (c + blCount(l - 1)) << 1
      nextCode(l) = c
    }
    i = 0
    while (i < lens.length) {
      val l = lens(i)
      if (l > 0) {
        if (!h.insert(i, nextCode(l), l)) return None
        nextCode(l) += 1
      }
      i += 1
    }
    Some(h)
  }

  /** Canonical codes for a length array (encoder side, same
    * assignment order as [[buildHuff]]). */
  private def canonicalCodes(lens: Array[Int]): Array[Int] = {
    val maxL = lens.foldLeft(0)(math.max)
    val blCount = new Array[Int](maxL + 1)
    lens.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](maxL + 1)
    var c = 0
    for (l <- 1 to maxL) {
      c = (c + blCount(l - 1)) << 1
      nextCode(l) = c
    }
    lens.map { l =>
      if (l == 0) 0 else { val x = nextCode(l); nextCode(l) += 1; x }
    }
  }

  /** A COMPLETE (Kraft sum exactly 1) code over the used symbols:
    * with n used symbols and L = ⌈log2 n⌉, the first 2^L − n get
    * length L−1 and the rest L — valid canonical lengths at any n ≥ 2.
    * Compression-optimal codes are not the point here; completeness
    * and exact canonical agreement with the decoder are. */
  private def balancedLens(alphabet: Int, used: Seq[Int]): Array[Int] = {
    val lens = new Array[Int](alphabet)
    val n = used.size
    require(n >= 2)
    val big = 32 - Integer.numberOfLeadingZeros(n - 1) // ceil log2 n
    val nShort = (1 << big) - n
    used.zipWithIndex.foreach { case (s, i) =>
      lens(s) = if (i < nShort && big > 1) big - 1 else big
    }
    lens
  }

  /** kCodeLengthCodeOrder. */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
  private val ClIndex: Array[Int] = {
    val a = new Array[Int](19)
    ClOrder.zipWithIndex.foreach { case (v, i) => a(v) = i }
    a
  }

  // ── LZ77 prefix (length/distance) value coding ──────────────────

  /** code → value: codes 0..3 are 1..4; above, an exponential ladder
    * with (code−2)>>1 extra bits. */
  private def prefixValue(r: BitReader, code: Int): Int = {
    if (code < 0) -1
    else if (code < 4) code + 1
    else {
      val eb = (code - 2) >> 1
      val off = (2 + (code & 1)) << eb
      val x = r.u(eb)
      if (x < 0) -1 else off + x + 1
    }
  }

  /** value → (code, extraBits, extraValue). */
  private def prefixEncode(v: Int): (Int, Int, Int) = {
    require(v >= 1)
    if (v <= 4) (v - 1, 0, 0)
    else {
      var s = 4
      while (true) {
        val eb = (s - 2) >> 1
        val off = (2 + (s & 1)) << eb
        if (v >= off + 1 && v <= off + (1 << eb)) return (s, eb, v - off - 1)
        s += 1
      }
      throw new IllegalStateException
    }
  }

  private def cacheHash(px: Int, bits: Int): Int =
    (0x1e35a7bd * px) >>> (32 - bits)

  // ── code (de)serialization ──────────────────────────────────────

  private def readCode(r: BitReader, alphabet: Int): Option[Huff] = {
    if (r.u(1) == 1) {
      // simple code: 1 or 2 symbols, listed order = code order
      val nsym = r.u(1) + 1
      val is8 = r.u(1)
      val s0 = if (is8 == 1) r.u(8) else r.u(1)
      if (r.fail || s0 < 0 || s0 >= alphabet) return None
      val h = new Huff
      if (nsym == 1) { h.single = s0; return Some(h) }
      val s1 = r.u(8)
      if (r.fail || s1 < 0 || s1 >= alphabet || s1 == s0) return None
      if (!h.insert(s0, 0, 1) || !h.insert(s1, 1, 1)) return None
      Some(h)
    } else {
      val num = 4 + r.u(4)
      if (r.fail || num > 19) return None
      val clLens = new Array[Int](19)
      var i = 0
      while (i < num) {
        val v = r.u(3)
        if (v < 0) return None
        clLens(ClOrder(i)) = v
        i += 1
      }
      val clh = buildHuff(clLens).getOrElse(return None)
      var maxSymbol = alphabet
      if (r.u(1) == 1) {
        val nb = 2 + 2 * r.u(3)
        if (r.fail) return None
        maxSymbol = 2 + r.u(nb)
        if (r.fail || maxSymbol > alphabet) return None
      }
      val lens = new Array[Int](alphabet)
      var at = 0
      var prev = 8
      while (at < alphabet && maxSymbol > 0) {
        maxSymbol -= 1
        val s = clh.read(r)
        if (s < 0 || r.fail) return None
        if (s < 16) {
          lens(at) = s; at += 1
          if (s != 0) prev = s
        } else if (s == 16) {
          val rep = 3 + r.u(2)
          if (r.fail || at + rep > alphabet) return None
          var k = 0
          while (k < rep) { lens(at) = prev; at += 1; k += 1 }
        } else if (s == 17) {
          val rep = 3 + r.u(3)
          if (r.fail || at + rep > alphabet) return None
          at += rep
        } else {
          val rep = 11 + r.u(7)
          if (r.fail || at + rep > alphabet) return None
          at += rep
        }
      }
      buildHuff(lens)
    }
  }

  /** Encoder-side code: header already written; `write` emits one
    * symbol. kind 0 = 0-bit single, 1 = 2-symbol simple, 2 = full. */
  private final class WCode(kind: Int, lens: Array[Int],
      codes: Array[Int], syms: Seq[Int]) {
    def write(bw: BitWriter, sym: Int): Unit = kind match {
      case 0 => // zero bits
      case 1 => bw.u(if (sym == syms.head) 0 else 1, 1)
      case _ => bw.code(codes(sym), lens(sym))
    }
  }

  private def writeFullCode(bw: BitWriter, lens: Array[Int]): Unit = {
    bw.u(0, 1) // not simple
    // tokenize: literal lengths + 17/18 zero runs
    val toks = ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i < lens.length) {
      if (lens(i) == 0) {
        var run = 0
        while (i + run < lens.length && lens(i + run) == 0) run += 1
        i += run
        while (run >= 11) {
          val take = math.min(run, 138)
          toks += ((18, take - 11)); run -= take
        }
        if (run >= 3) { toks += ((17, run - 3)); run = 0 }
        while (run > 0) { toks += ((0, 0)); run -= 1 }
      } else {
        toks += ((lens(i), 0))
        i += 1
      }
    }
    // the code-length code itself: balanced over its used symbols,
    // padded to 2 so the tree is never a Kraft-incomplete singleton
    var clSyms = toks.map(_._1).distinct.sorted.toSeq
    if (clSyms.size == 1)
      clSyms = (clSyms :+ (if (clSyms.head == 0) 1 else 0)).sorted
    val clLens = balancedLens(19, clSyms)
    val clCodes = canonicalCodes(clLens)
    val num = math.max(4, clSyms.map(ClIndex(_)).max + 1)
    bw.u(num - 4, 4)
    var k = 0
    while (k < num) { bw.u(clLens(ClOrder(k)), 3); k += 1 }
    bw.u(0, 1) // no max_symbol shortcut
    toks.foreach { case (s, extra) =>
      bw.code(clCodes(s), clLens(s))
      if (s == 16) bw.u(extra, 2)
      else if (s == 17) bw.u(extra, 3)
      else if (s == 18) bw.u(extra, 7)
    }
  }

  private def makeCode(bw: BitWriter, alphabet: Int,
      usedIn: Seq[Int]): WCode = {
    val used = usedIn.distinct.sorted
    require(used.nonEmpty && used.forall(s => s >= 0 && s < alphabet))
    if (used.size <= 2 && used.forall(_ <= 255)) {
      bw.u(1, 1) // simple
      bw.u(used.size - 1, 1)
      val s0 = used.head
      if (s0 > 1) { bw.u(1, 1); bw.u(s0, 8) }
      else { bw.u(0, 1); bw.u(s0, 1) }
      if (used.size == 2) bw.u(used(1), 8)
      new WCode(if (used.size == 1) 0 else 1, null, null, used)
    } else {
      val lens = balancedLens(alphabet, used)
      writeFullCode(bw, lens)
      new WCode(2, lens, canonicalCodes(lens), used)
    }
  }

  // ── encode ──────────────────────────────────────────────────────

  private sealed trait Tok
  private final case class Lit(px: Int) extends Tok
  private final case class Run(len: Int) extends Tok
  private final case class CacheRef(idx: Int) extends Tok

  /** Encode ARGB pixels into a complete `.webp` file (RIFF + VP8L
    * chunk): optional subtract-green transform, distance-1 LZ77 runs
    * (emitted as direct distance codes), optional color cache. The
    * stream decodes with [[decode]] AND with any spec-complete
    * decoder. */
  def encode(w: Int, h: Int, argb: Array[Int],
      subtractGreen: Boolean = false, cacheBits: Int = 0): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= (1 << 14) && h <= (1 << 14))
    require(argb.length == w * h)
    require(cacheBits >= 0 && cacheBits <= 11)
    val px =
      if (!subtractGreen) argb
      else argb.map { p =>
        val g = (p >>> 8) & 0xff
        val r2 = (((p >>> 16) & 0xff) - g) & 0xff
        val b2 = ((p & 0xff) - g) & 0xff
        (p & 0xff000000) | (r2 << 16) | (g << 8) | b2
      }
    // tokenize
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = new Array[Int](math.max(cacheSize, 1))
    val cacheValid = new Array[Boolean](math.max(cacheSize, 1))
    def insert(p: Int): Unit = if (cacheSize > 0) {
      val hsh = cacheHash(p, cacheBits)
      cache(hsh) = p; cacheValid(hsh) = true
    }
    val toks = ArrayBuffer.empty[Tok]
    var i = 0
    while (i < px.length) {
      var run = 0
      if (i > 0 && px(i) == px(i - 1)) {
        while (i + run < px.length && px(i + run) == px(i - 1) &&
          run < 4096) run += 1
      }
      if (run >= 3) {
        toks += Run(run)
        insert(px(i - 1))
        i += run
      } else {
        val p = px(i)
        val hsh = if (cacheSize > 0) cacheHash(p, cacheBits) else 0
        if (cacheSize > 0 && cacheValid(hsh) && cache(hsh) == p)
          toks += CacheRef(hsh)
        else toks += Lit(p)
        insert(p)
        i += 1
      }
    }
    // used-symbol sets
    val greenUsed = toks.collect {
      case Lit(p) => (p >>> 8) & 0xff
      case Run(len) => 256 + prefixEncode(len)._1
      case CacheRef(idx) => 256 + 24 + idx
    }
    val redUsed = toks.collect { case Lit(p) => (p >>> 16) & 0xff }
    val blueUsed = toks.collect { case Lit(p) => p & 0xff }
    val alphaUsed = toks.collect { case Lit(p) => (p >>> 24) & 0xff }
    val distUsed =
      if (toks.exists(_.isInstanceOf[Run])) Seq(prefixEncode(121)._1)
      else Seq(0)
    val bw = new BitWriter
    bw.u(0x2F, 8)
    bw.u(w - 1, 14); bw.u(h - 1, 14)
    bw.u(0, 1) // alpha hint
    bw.u(0, 3) // version
    if (subtractGreen) { bw.u(1, 1); bw.u(2, 2) }
    bw.u(0, 1) // no (more) transforms
    if (cacheBits > 0) { bw.u(1, 1); bw.u(cacheBits, 4) }
    else bw.u(0, 1)
    bw.u(0, 1) // no meta-prefix image
    val gC = makeCode(bw, 256 + 24 + cacheSize, greenUsed.toSeq)
    val rC = makeCode(bw, 256, redUsed.toSeq)
    val bC = makeCode(bw, 256, blueUsed.toSeq)
    val aC = makeCode(bw, 256, alphaUsed.toSeq)
    val dC = makeCode(bw, 40, distUsed)
    toks.foreach {
      case Lit(p) =>
        gC.write(bw, (p >>> 8) & 0xff)
        rC.write(bw, (p >>> 16) & 0xff)
        bC.write(bw, p & 0xff)
        aC.write(bw, (p >>> 24) & 0xff)
      case Run(len) =>
        val (s, eb, ex) = prefixEncode(len)
        gC.write(bw, 256 + s)
        bw.u(ex, eb)
        val (ds, deb, dex) = prefixEncode(121) // distance 1, direct
        dC.write(bw, ds)
        bw.u(dex, deb)
      case CacheRef(idx) =>
        gC.write(bw, 256 + 24 + idx)
    }
    val body = bw.result()
    // RIFF container
    val out = new java.io.ByteArrayOutputStream()
    def o8(v: Int): Unit = out.write(v & 0xff)
    def o32(v: Int): Unit = { o8(v); o8(v >> 8); o8(v >> 16); o8(v >> 24) }
    out.write("RIFF".getBytes("US-ASCII"))
    o32(4 + 8 + body.length + (body.length & 1))
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII"))
    o32(body.length)
    out.write(body, 0, body.length)
    if ((body.length & 1) != 0) o8(0)
    out.toByteArray
  }

  // ── decode ──────────────────────────────────────────────────────

  /** Decode a `.webp` file's VP8L chunk to (width, height, ARGB
    * raster). None on anything malformed or outside the documented
    * subset — never throws. */
  def decode(data: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    // RIFF walk to the VP8L chunk
    if (data.length < 20) return None
    def tag(o: Int): String =
      if (o + 4 <= data.length) new String(data, o, 4, "US-ASCII") else ""
    def u8(o: Int): Int = data(o) & 0xff
    if (tag(0) != "RIFF" || tag(8) != "WEBP") return None
    val riffEnd = math.min(data.length.toLong,
      8L + (u8(4) | (u8(5) << 8) | (u8(6) << 16) |
        ((u8(7) & 0x7f) << 24))).toInt
    var off = 12
    var chunk = -1
    var chunkLen = 0
    while (chunk < 0 && off + 8 <= riffEnd) {
      val id = tag(off)
      val len = u8(off + 4) | (u8(off + 5) << 8) | (u8(off + 6) << 16) |
        (u8(off + 7) << 24)
      if (len < 0 || off + 8 + len > riffEnd) return None
      if (id == "VP8L") { chunk = off + 8; chunkLen = len }
      else off += 8 + len + (len & 1)
    }
    if (chunk < 0 || chunkLen < 5) return None
    val body = java.util.Arrays.copyOfRange(data, chunk, chunk + chunkLen)
    if ((body(0) & 0xff) != 0x2F) return None
    val r = new BitReader(body, 1)
    val w = r.u(14) + 1
    val h = r.u(14) + 1
    r.u(1) // alpha hint
    if (r.u(3) != 0 || r.fail) return None
    if (w.toLong * h > (1L << 24)) return None // decode-bomb guard
    // transforms
    var subtractGreen = false
    var more = r.u(1)
    while (more == 1) {
      val t = r.u(2)
      if (t != 2 || subtractGreen) return None // subset: SUBTRACT_GREEN once
      subtractGreen = true
      more = r.u(1)
    }
    if (more < 0) return None
    var cacheBits = 0
    if (r.u(1) == 1) {
      cacheBits = r.u(4)
      if (cacheBits < 1 || cacheBits > 11) return None
    }
    if (r.u(1) == 1) return None // meta-prefix image: out of subset
    if (r.fail) return None
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val gH = readCode(r, 256 + 24 + cacheSize).getOrElse(return None)
    val rH = readCode(r, 256).getOrElse(return None)
    val bH = readCode(r, 256).getOrElse(return None)
    val aH = readCode(r, 256).getOrElse(return None)
    val dH = readCode(r, 40).getOrElse(return None)
    val out = new Array[Int](w * h)
    val cache = new Array[Int](math.max(cacheSize, 1))
    var pos = 0
    def push(p: Int): Unit = {
      out(pos) = p
      pos += 1
      if (cacheSize > 0) cache(cacheHash(p, cacheBits)) = p
    }
    while (pos < w * h) {
      val g = gH.read(r)
      if (g < 0 || r.fail) return None
      if (g < 256) {
        val rr = rH.read(r)
        val bb = bH.read(r)
        val aa = aH.read(r)
        if (rr < 0 || bb < 0 || aa < 0 || r.fail) return None
        push((aa << 24) | (rr << 16) | (g << 8) | bb)
      } else if (g < 256 + 24) {
        val len = prefixValue(r, g - 256)
        val ds = dH.read(r)
        val dcode = prefixValue(r, ds)
        if (len < 1 || dcode < 1 || r.fail) return None
        if (dcode <= 120) return None // neighbor-map codes: out of subset
        val d = dcode - 120
        if (d > pos || pos + len > w * h) return None
        var k = 0
        while (k < len) { push(out(pos - d)); k += 1 }
      } else {
        val idx = g - 256 - 24
        if (idx >= cacheSize) return None
        push(cache(idx))
      }
    }
    if (subtractGreen) {
      var i = 0
      while (i < out.length) {
        val p = out(i)
        val gg = (p >>> 8) & 0xff
        val r2 = (((p >>> 16) & 0xff) + gg) & 0xff
        val b2 = ((p & 0xff) + gg) & 0xff
        out(i) = (p & 0xff000000) | (r2 << 16) | (gg << 8) | b2
        i += 1
      }
    }
    Some((w, h, out))
  }
}
