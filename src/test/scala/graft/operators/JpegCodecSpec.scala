package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec (operators/Jpeg.scala): the encoder writes real
  * interleaved SOF0 streams and the decoder runs the full baseline
  * pipeline, so the spec pins (1) the bit-exact constant-block round
  * trip the DuckDB oracle relies on, (2) AC-bearing blocks against an
  * INDEPENDENT naive-formula IDCT, (3) 4:2:0 subsampled MCU layout,
  * (4) restart-marker handling with DC predictor resets, (5) byte
  * stuffing evidence in the entropy stream, and (6) malformed-payload
  * rejection (the sentinel path must never throw). */
class JpegCodecSpec extends AnyFunSuite {

  /** Expected RGB for an encodePixels fixture: pixel in block k of
    * value v decodes to exactly (v+7, v−4, v) — see Jpeg.encodePixels. */
  private def expectedRgb(bw: Int, bh: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 * bw * 8 * bh * 3)
    for (y <- 0 until 8 * bh; x <- 0 until 8 * bw) {
      val k = (y / 8) * bw + (x / 8)
      val v = payload(k % payload.length) & 0xff
      val o = (y * 8 * bw + x) * 3
      out(o) = (v + 7).toByte
      out(o + 1) = (v - 4).toByte
      out(o + 2) = v.toByte
    }
    out
  }

  test("constant-block color fixture round-trips bit-exactly (the oracle contract)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 50) {
      val bw = 1 + rnd.nextInt(8)
      val bh = 1 + rnd.nextInt(8)
      val payload = Array.fill(1 + rnd.nextInt(40))((32 + rnd.nextInt(95)).toByte)
      val jpg = Jpeg.encodePixels(bw, bh, payload)
      val Some((w, h, rgb)) = Jpeg.decodePixels(jpg)
      assert(w == 8 * bw && h == 8 * bh, s"trial $trial dims")
      assert(rgb.sameElements(expectedRgb(bw, bh, payload)),
        s"trial $trial ${bw}x$bh len=${payload.length}")
    }
  }

  test("the pixel fixtures also satisfy the dimension-only marker walk") {
    val jpg = Jpeg.encodePixels(3, 5, "hello world".getBytes)
    assert(Multimodal.decodeJpegDims(jpg).contains((24, 40)))
    assert(Multimodal.decodePixels("image/jpeg", jpg).nonEmpty)
  }

  /** Independent reference: the direct O(64²) IDCT formula from T.81
    * A.3.3, written differently from the production separable pass. */
  private def refIdct(coefNat: Array[Int]): Array[Int] = {
    def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8)
        s += c(u) * c(v) * coefNat(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      val p = Math.round(s / 4.0 + 128.0).toInt
      out(y * 8 + x) = math.max(0, math.min(255, p))
    }
    out
  }

  test("AC-bearing grayscale blocks decode to the reference IDCT (±1)") {
    val rnd = new scala.util.Random(11)
    val nBlocks = 6
    // quantized zigzag coefficients: sparse, |coef| ≤ 200 (category ≤ 8)
    val blocks = Array.fill(nBlocks) {
      val zz = new Array[Int](64)
      zz(0) = rnd.nextInt(400) - 200
      for (_ <- 0 until 12) zz(1 + rnd.nextInt(63)) = rnd.nextInt(401) - 200
      zz
    }
    val ones = Array.fill(64)(1)
    val jpg = Jpeg.encodeBaseline(8 * nBlocks, 8, Seq((1, 1)),
      Seq(ones, ones), Seq(0), (_, seq) => blocks(seq))
    val Some((w, h, rgb)) = Jpeg.decodePixels(jpg)
    assert(w == 8 * nBlocks && h == 8)
    for (b <- 0 until nBlocks) {
      val nat = new Array[Int](64)
      for (k <- 0 until 64) nat(Jpeg.Zigzag(k)) = blocks(b)(k)
      val ref = refIdct(nat)
      for (y <- 0 until 8; x <- 0 until 8) {
        val got = rgb(((y * w) + b * 8 + x) * 3) & 0xff
        // grayscale: R=G=B
        assert(rgb(((y * w) + b * 8 + x) * 3 + 1) == rgb(((y * w) + b * 8 + x) * 3))
        assert(math.abs(got - ref(y * 8 + x)) <= 1,
          s"block $b ($x,$y): got $got ref ${ref(y * 8 + x)}")
      }
    }
  }

  test("non-unit quant tables dequantize before the IDCT") {
    // one DC-only block with quantizer 16: stored DC 5 → dequant 80 → 10+128
    val q = Array.fill(64)(16)
    val zz = new Array[Int](64)
    zz(0) = 5
    val jpg = Jpeg.encodeBaseline(8, 8, Seq((1, 1)), Seq(q, q), Seq(0),
      (_, _) => zz)
    val Some((_, _, rgb)) = Jpeg.decodePixels(jpg)
    assert(rgb.forall(b => (b & 0xff) == 138), "5·16/8 + 128 = 138")
  }

  test("4:2:0 subsampling: four constant Y quadrants, nearest-upsampled chroma") {
    // one 16×16 MCU: Y blocks TL/TR/BL/BR constants, Cb/Cr shifted
    val yv = Array(40, 90, 140, 190)
    def dc(dc0: Int) = { val a = new Array[Int](64); a(0) = dc0; a }
    val ones = Array.fill(64)(1)
    val jpg = Jpeg.encodeBaseline(16, 16, Seq((2, 2), (1, 1), (1, 1)),
      Seq(ones, ones), Seq(0, 1, 1),
      (c, seq) => c match {
        case 0 => dc(8 * (yv(seq) - 128))
        case 1 => dc(8 * 0)  // Cb = 128
        case _ => dc(8 * 10) // Cr = 138 → R=y+14, G=y−7.14→y−7, B=y
      })
    val Some((w, h, rgb)) = Jpeg.decodePixels(jpg)
    assert(w == 16 && h == 16)
    for (y <- 0 until 16; x <- 0 until 16) {
      val v = yv((y / 8) * 2 + (x / 8))
      val o = (y * 16 + x) * 3
      assert((rgb(o) & 0xff) == v + 14, s"R at $x,$y")     // 1.402·10=14.02
      assert((rgb(o + 1) & 0xff) == v - 7, s"G at $x,$y")  // −0.714136·10
      assert((rgb(o + 2) & 0xff) == v, s"B at $x,$y")
    }
  }

  test("restart markers reset the DC predictors and still decode exactly") {
    val payload = (0 until 37).map(i => (33 + (i * 7) % 90).toByte).toArray
    val ones = Array.fill(64)(1)
    def dc(v: Int) = { val a = new Array[Int](64); a(0) = v; a }
    val bw0 = 6
    val bh0 = 6
    val jpg = Jpeg.encodeBaseline(8 * bw0, 8 * bh0,
      Seq((1, 1), (1, 1), (1, 1)), Seq(ones, ones), Seq(0, 1, 1),
      (c, seq) => c match {
        case 0 => dc(8 * ((payload(seq % payload.length) & 0xff) - 128))
        case 1 => dc(0)
        case _ => dc(40)
      }, restartInterval = 5)
    // the stream really contains RST markers
    val hasRst = jpg.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xFF && (p(1) & 0xff) >= 0xD0 && (p(1) & 0xff) <= 0xD7)
    assert(hasRst, "expected RSTn markers in the entropy stream")
    val Some((w2, h2, rgb)) = Jpeg.decodePixels(jpg)
    assert(w2 == 48 && h2 == 48)
    assert(rgb.sameElements(expectedRgb(bw0, bh0, payload)))
  }

  test("byte stuffing occurs across a fixture corpus and never breaks decode") {
    val rnd = new scala.util.Random(3)
    var sawStuffed = false
    for (_ <- 0 until 120) {
      val bw = 1 + rnd.nextInt(8)
      val bh = 1 + rnd.nextInt(8)
      val payload = Array.fill(1 + rnd.nextInt(60))((32 + rnd.nextInt(95)).toByte)
      val jpg = Jpeg.encodePixels(bw, bh, payload)
      // scan the entropy region (after SOS .. before EOI) for FF00
      var i = 2
      var sos = -1
      while (sos < 0 && i + 3 < jpg.length) {
        val m = jpg(i + 1) & 0xff
        val len = ((jpg(i + 2) & 0xff) << 8) | (jpg(i + 3) & 0xff)
        if (m == 0xDA) sos = i + 2 + len else i += 2 + len
      }
      var j = sos
      while (j + 1 < jpg.length - 2) {
        if ((jpg(j) & 0xff) == 0xFF && (jpg(j + 1) & 0xff) == 0x00)
          sawStuffed = true
        j += 1
      }
      assert(Jpeg.decodePixels(jpg).map(_._3)
        .exists(_.sameElements(expectedRgb(bw, bh, payload))))
    }
    assert(sawStuffed,
      "120 random fixtures should exercise FF00 byte stuffing")
  }

  test("malformed payloads reject with None, never throw") {
    val good = Jpeg.encodePixels(3, 3, "abcdefgh".getBytes)
    assert(Jpeg.decodePixels(Array.emptyByteArray).isEmpty)
    assert(Jpeg.decodePixels(Array[Byte](0xFF.toByte, 0xD8.toByte)).isEmpty)
    assert(Jpeg.decodePixels(good.take(good.length / 2)).isEmpty,
      "truncated entropy data")
    // progressive SOF2 must be rejected, not mis-decoded
    val prog = good.clone()
    val sofIdx = prog.indices.find(i => (prog(i) & 0xff) == 0xFF &&
      (prog(i + 1) & 0xff) == 0xC0).get
    prog(sofIdx + 1) = 0xC2.toByte
    assert(Jpeg.decodePixels(prog).isEmpty)
    // strip the DHT segments: entropy decode has no tables
    val noDht = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      out.write(good, 0, 2)
      i = 2
      var inHdr = true
      while (inHdr) {
        val m = good(i + 1) & 0xff
        if (m == 0xDA) {
          out.write(good, i, good.length - i)
          inHdr = false
        } else {
          val len = ((good(i + 2) & 0xff) << 8) | (good(i + 3) & 0xff)
          if (m != 0xC4) out.write(good, i, 2 + len)
          i += 2 + len
        }
      }
      out.toByteArray
    }
    assert(Jpeg.decodePixels(noDht).isEmpty)
    // good one still passes after all the surgery above (no aliasing)
    assert(Jpeg.decodePixels(good).nonEmpty)
  }

  test("progressive constant-block fixture round-trips bit-exactly") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 40) {
      val bw = 1 + rnd.nextInt(8)
      val bh = 1 + rnd.nextInt(8)
      val payload = Array.fill(1 + rnd.nextInt(40))((32 + rnd.nextInt(95)).toByte)
      val jpg = Jpeg.encodeProgressivePixels(bw, bh, payload)
      // really SOF2, with 8 SOS segments
      def countMarker(m: Int): Int = jpg.sliding(2).count(p =>
        (p(0) & 0xff) == 0xFF && (p(1) & 0xff) == m)
      assert(countMarker(0xC2) >= 1 && countMarker(0xC0) == 0)
      val Some((w, h, rgb)) = Jpeg.decodePixels(jpg)
      assert(w == 8 * bw && h == 8 * bh, s"trial $trial dims")
      assert(rgb.sameElements(expectedRgb(bw, bh, payload)),
        s"trial $trial ${bw}x$bh len=${payload.length}")
    }
  }

  test("progressive AC successive approximation equals baseline decode") {
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 10) {
      val nb = 2 + rnd.nextInt(6)
      val blocks = Array.fill(nb) {
        val zz = new Array[Int](64)
        zz(0) = rnd.nextInt(400) - 200
        for (_ <- 0 until 14) zz(1 + rnd.nextInt(63)) = rnd.nextInt(401) - 200
        zz
      }
      val ones = Array.fill(64)(1)
      val base = Jpeg.encodeBaseline(8 * nb, 8, Seq((1, 1)),
        Seq(ones, ones), Seq(0), (_, s) => blocks(s))
      val prog = Jpeg.encodeProgressive(8 * nb, 8, Seq((1, 1)),
        Seq(ones, ones), Seq(0), (_, s) => blocks(s),
        Seq(
          Jpeg.ScanSpec(Seq(0), 0, 0, 0, 2),   // DC first, Al=2
          Jpeg.ScanSpec(Seq(0), 0, 0, 2, 1),   // DC refine
          Jpeg.ScanSpec(Seq(0), 0, 0, 1, 0),   // DC refine
          Jpeg.ScanSpec(Seq(0), 1, 20, 0, 1),  // AC band 1 first, Al=1
          Jpeg.ScanSpec(Seq(0), 21, 63, 0, 1), // AC band 2 first, Al=1
          Jpeg.ScanSpec(Seq(0), 1, 20, 1, 0),  // AC band 1 refine
          Jpeg.ScanSpec(Seq(0), 21, 63, 1, 0)))// AC band 2 refine
      val b = Jpeg.decodePixels(base)
      val p = Jpeg.decodePixels(prog)
      assert(b.nonEmpty && p.nonEmpty, s"trial $trial decode")
      assert(b.get._3.sameElements(p.get._3),
        s"trial $trial: progressive must reconstruct the same coefficients")
    }
  }

  test("progressive color with subsampling equals its baseline twin") {
    val rnd = new scala.util.Random(23)
    val ones = Array.fill(64)(1)
    // 2 MCUs of 4:2:0: Y has 8 blocks, chroma 2 each; random sparse coefs
    def mk() = {
      val zz = new Array[Int](64)
      zz(0) = rnd.nextInt(200) - 100
      for (_ <- 0 until 6) zz(1 + rnd.nextInt(63)) = rnd.nextInt(101) - 50
      zz
    }
    val y = Array.fill(8)(mk())
    val cbb = Array.fill(2)(mk())
    val crb = Array.fill(2)(mk())
    def pick(c: Int, s: Int) = c match {
      case 0 => y(s); case 1 => cbb(s); case _ => crb(s)
    }
    val base = Jpeg.encodeBaseline(32, 16, Seq((2, 2), (1, 1), (1, 1)),
      Seq(ones, ones), Seq(0, 1, 1), pick)
    val prog = Jpeg.encodeProgressive(32, 16, Seq((2, 2), (1, 1), (1, 1)),
      Seq(ones, ones), Seq(0, 1, 1), pick,
      Seq(
        Jpeg.ScanSpec(Seq(0, 1, 2), 0, 0, 0, 1),
        Jpeg.ScanSpec(Seq(0, 1, 2), 0, 0, 1, 0),
        Jpeg.ScanSpec(Seq(0), 1, 63, 0, 0),
        Jpeg.ScanSpec(Seq(1), 1, 63, 0, 0),
        Jpeg.ScanSpec(Seq(2), 1, 63, 0, 0)))
    val b = Jpeg.decodePixels(base)
    val p = Jpeg.decodePixels(prog)
    assert(b.nonEmpty && p.nonEmpty)
    assert(b.get._3.sameElements(p.get._3))
  }

  test("progressive malformed: truncation and bad scan headers reject") {
    val good = Jpeg.encodeProgressivePixels(3, 3, "abcdefgh".getBytes)
    assert(Jpeg.decodePixels(good).nonEmpty)
    assert(Jpeg.decodePixels(good.take(good.length / 3)).isEmpty)
    assert(Jpeg.decodePixels(good.take(good.length - 3)).isEmpty,
      "missing EOI after final scan")
    // an AC scan over >1 component is illegal
    intercept[IllegalArgumentException] {
      Jpeg.encodeProgressive(8, 8, Seq((1, 1), (1, 1), (1, 1)),
        Seq(Array.fill(64)(1), Array.fill(64)(1)), Seq(0, 1, 1),
        (_, _) => new Array[Int](64),
        Seq(Jpeg.ScanSpec(Seq(0, 1), 1, 63, 0, 0)))
    }
  }

  test("grayscale single-component stream replicates into RGB") {
    val zz = new Array[Int](64)
    zz(0) = 8 * (200 - 128)
    val ones = Array.fill(64)(1)
    val jpg = Jpeg.encodeBaseline(8, 8, Seq((1, 1)), Seq(ones, ones),
      Seq(0), (_, _) => zz)
    val Some((_, _, rgb)) = Jpeg.decodePixels(jpg)
    assert(rgb.forall(b => (b & 0xff) == 200))
  }
}
