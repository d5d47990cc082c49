package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** QOI pins: hand-computed chunk layouts for each op (RUN, INDEX,
  * DIFF, LUMA, RGB), exact round trips across raster shapes, the
  * 4-channel decode path, end-marker/overrun/trailing-garbage
  * rejection, and mutation + garbage fuzz. */
class QoiSpec extends AnyFunSuite {

  private def raster(w: Int, h: Int)(f: Int => (Int, Int, Int)): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    for (i <- 0 until w * h) {
      val (r, g, b) = f(i)
      px(3 * i) = r.toByte; px(3 * i + 1) = g.toByte; px(3 * i + 2) = b.toByte
    }
    px
  }

  private def rt(w: Int, h: Int, px: Array[Byte]): Unit = {
    val enc = Qoi.encode(w, h, px)
    val dec = Qoi.decode(enc)
    assert(dec.isDefined)
    val (gw, gh, gpx) = dec.get
    assert(gw == w && gh == h)
    assert(gpx.sameElements(px))
  }

  test("round trips across raster shapes") {
    rt(1, 1, raster(1, 1)(_ => (10, 20, 30)))
    rt(7, 3, raster(7, 3)(i => (i * 17 % 256, i * 29 % 256, i * 43 % 256)))
    rt(16, 16, raster(16, 16)(_ => (200, 100, 50)))   // one long run
    rt(64, 2, raster(64, 2)(i => if (i % 2 == 0) (1, 2, 3) else (4, 5, 6)))
    rt(5, 5, raster(5, 5)(i => (i, i, i)))            // small diffs
    rt(9, 9, raster(9, 9)(i => (i * 3 % 256, i * 3 % 256, (i * 3 + 7) % 256)))
    val rnd = new scala.util.Random(5)
    rt(33, 21, raster(33, 21)(_ =>
      (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256))))
  }

  test("hand-pinned chunks: run, diff, rgb") {
    // 4 identical pixels (0,0,0) = the start pixel -> one RUN of 4
    val runEnc = Qoi.encode(4, 1, raster(4, 1)(_ => (0, 0, 0)))
    // header 14 bytes, then 0xc0|3, then 8-byte marker
    assert(runEnc.length == 14 + 1 + 8)
    assert((runEnc(14) & 0xff) == (0xc0 | 3))
    // first pixel (1,1,1): diff +1,+1,+1 from (0,0,0) -> 0x40|0b111111
    val diffEnc = Qoi.encode(1, 1, raster(1, 1)(_ => (1, 1, 1)))
    assert((diffEnc(14) & 0xff) == (0x40 | (3 << 4) | (3 << 2) | 3))
    // a far color needs OP_RGB: fe r g b
    val rgbEnc = Qoi.encode(1, 1, raster(1, 1)(_ => (200, 10, 99)))
    assert((rgbEnc(14) & 0xff) == 0xfe)
    assert((rgbEnc(15) & 0xff) == 200 && (rgbEnc(16) & 0xff) == 10 &&
      (rgbEnc(17) & 0xff) == 99)
  }

  test("index op round trip: alternating colors hit the hash table") {
    val px = raster(62, 1)(i =>
      if (i % 2 == 0) (100, 0, 0) else (0, 100, 0))
    val enc = Qoi.encode(62, 1, px)
    // after the first occurrences, alternations are 1-byte INDEX ops —
    // the stream must be much shorter than OP_RGB for every pixel
    assert(enc.length < 14 + 62 * 2 + 8)
    rt(62, 1, px)
  }

  test("4-channel streams decode (alpha folded away)") {
    // hand-build: header channels=4 + one RGBA chunk + marker
    val out = new java.io.ByteArrayOutputStream()
    out.write("qoif".getBytes)
    def be32(v: Int): Unit = { out.write(v >>> 24); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    be32(1); be32(1); out.write(4); out.write(0)
    out.write(0xff); out.write(7); out.write(8); out.write(9); out.write(128)
    (0 until 7).foreach(_ => out.write(0)); out.write(1)
    val dec = Qoi.decode(out.toByteArray)
    assert(dec.isDefined)
    assert(dec.get._3.sameElements(Array[Byte](7, 8, 9)))
  }

  test("rejections: bad header, short stream, wrong marker, trailing bytes") {
    val good = Qoi.encode(2, 2, raster(2, 2)(i => (i, 0, 0)))
    assert(Qoi.decode(good).isDefined)
    assert(Qoi.decode("qoif".getBytes).isEmpty)
    assert(Qoi.decode(good.dropRight(1)).isEmpty)    // marker cut
    assert(Qoi.decode(good :+ 0.toByte).isEmpty)     // trailing garbage
    val badMark = good.clone(); badMark(badMark.length - 1) = 2
    assert(Qoi.decode(badMark).isEmpty)
    val badChan = good.clone(); badChan(12) = 5
    assert(Qoi.decode(badChan).isEmpty)
    // pixel overrun: extend a run past w*h
    val px1 = Qoi.encode(1, 1, raster(1, 1)(_ => (0, 0, 0)))
    val over = px1.clone()
    over(14) = (0xc0 | 5).toByte // run 6 into a 1-px raster
    assert(Qoi.decode(over).isEmpty)
  }

  test("mutation and garbage fuzz never throw, never invent dims") {
    val px = raster(11, 7)(i => (i * 31 % 256, i * 7 % 256, i % 256))
    val enc = Qoi.encode(11, 7, px)
    for (i <- enc.indices) {
      val bad = enc.clone()
      bad(i) = (bad(i) ^ 0x55).toByte
      Qoi.decode(bad).foreach { case (w, h, p) =>
        assert(w == 11 && h == 7 && p.length == 11 * 7 * 3)
      }
    }
    val rnd = new scala.util.Random(0x901)
    for (_ <- 0 until 2000) {
      val junk = Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      Qoi.decode(junk)
    }
  }
}
