package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Animated GIF walk: multi-frame LZW decode, GCE delay folding,
  * sub-rect compositing, disposal-2 background restore and interlaced
  * frames — all against hand-computed canvas sums. */
class GifAnimSpec extends AnyFunSuite {

  // palette ramp: index i → (i, 2i mod 256, 3i mod 256)
  private def rgbOf(i: Int) = (i, (2 * i) % 256, (3 * i) % 256)

  private def canvasSums(canvas: Array[Int]): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    canvas.foreach { i =>
      val (cr, cg, cb) = rgbOf(i)
      r += cr; g += cg; b += cb
    }
    (r, g, b)
  }

  test("full-rect animation: frame count, delays, per-frame sums") {
    val w = 6; val h = 4; val nf = 5
    def px(f: Int, k: Int): Int = (10 * f + k) % 256
    val gif = Multimodal.encodeGifFrames(w, h, nf, px, f => 3 + f)
    val Some(a) = Multimodal.decodeGifFrames(gif)
    assert(a.width == w && a.height == h && a.nFrames == nf)
    assert(a.totalDelayCs == (0 until nf).map(3 + _).sum)
    var (er, eg, eb) = (0L, 0L, 0L)
    for (f <- 0 until nf) {
      val (r, g, b) = canvasSums(Array.tabulate(w * h)(px(f, _)))
      er += r; eg += g; eb += b
    }
    assert((a.sumR, a.sumG, a.sumB) == ((er, eg, eb)))
  }

  test("sub-rect frames composite onto the running canvas") {
    val w = 8; val h = 8
    // frame 0: full canvas of index 7; frame 1: 2×2 patch of index 50
    // at (3,4); frame 2: 1×8 column of index 99 at x=0
    val rects = Array((0, 0, 8, 8), (3, 4, 2, 2), (0, 0, 1, 8))
    val fills = Array(7, 50, 99)
    val gif = Multimodal.encodeGifFrames(w, h, 3,
      (f, _) => fills(f), _ => 1, rectOf = f => rects(f))
    val Some(a) = Multimodal.decodeGifFrames(gif)
    val canvas = Array.fill(w * h)(7)
    var (er, eg, eb) = canvasSums(canvas)
    for (x <- 3 until 5; y <- 4 until 6) canvas(y * w + x) = 50
    val s1 = canvasSums(canvas)
    for (y <- 0 until 8) canvas(y * w) = 99
    val s2 = canvasSums(canvas)
    er += s1._1 + s2._1; eg += s1._2 + s2._2; eb += s1._3 + s2._3
    assert(a.nFrames == 3 && a.totalDelayCs == 3)
    assert((a.sumR, a.sumG, a.sumB) == ((er, eg, eb)))
  }

  test("disposal 2 restores the frame rect to the background color") {
    val w = 4; val h = 4
    // hand-build: GCE(disposal=2) + full frame of 100, then GCE(disposal=1)
    // + sub-rect frame; background index 0 → (0,0,0)
    val base = Multimodal.encodeGifFrames(w, h, 2,
      (f, _) => if (f == 0) 100 else 25, _ => 2,
      rectOf = f => if (f == 0) (0, 0, 4, 4) else (1, 1, 2, 2))
    // flip frame 0's GCE disposal bits (byte after 0x21 0xF9 0x04)
    val gceAt = (13 + 768 until base.length)
      .find(i => (base(i) & 0xff) == 0x21 &&
        (base(i + 1) & 0xff) == 0xF9).get
    val patched = base.clone()
    patched(gceAt + 3) = (2 << 2).toByte
    val Some(a) = Multimodal.decodeGifFrames(patched)
    // after frame 0: all 100; then rect restored to bg 0, frame 1 paints
    // 25 over the middle 2×2
    val c0 = Array.fill(w * h)(100)
    val s0 = canvasSums(c0)
    val c1 = Array.fill(w * h)(0)
    for (x <- 1 until 3; y <- 1 until 3) c1(y * w + x) = 25
    val s1 = canvasSums(c1)
    assert((a.sumR, a.sumG, a.sumB) ==
      ((s0._1 + s1._1, s0._2 + s1._2, s0._3 + s1._3)))
  }

  test("interlaced frames decode identically to progressive-scan frames") {
    val w = 9; val h = 13 // odd dims stress the 4-pass row order
    def px(f: Int, k: Int): Int = (37 * k + f) % 256
    val plain = Multimodal.encodeGifFrames(w, h, 2, px, _ => 1)
    val inter = Multimodal.encodeGifFrames(w, h, 2, px, _ => 1,
      interlaceFrame = _ => true)
    val (Some(a), Some(b)) =
      (Multimodal.decodeGifFrames(plain), Multimodal.decodeGifFrames(inter))
    assert(a == b)
  }

  test("malformed: truncation, missing trailer, frame out of bounds") {
    val good = Multimodal.encodeGifFrames(4, 4, 2, (_, k) => k % 256, _ => 1)
    assert(Multimodal.decodeGifFrames(good).exists(_.nFrames == 2))
    assert(Multimodal.decodeGifFrames(good.take(good.length / 2)).isEmpty)
    assert(Multimodal.decodeGifFrames(good.dropRight(1)).isEmpty,
      "no trailer")
    // an image descriptor whose rect exceeds the logical screen
    // (search past the 13-byte header + 768-byte GCT: palette bytes
    // can alias the 0x2C introducer)
    val oob = good.clone()
    val idAt = (13 + 768 until oob.length)
      .find(i => (oob(i) & 0xff) == 0x2C).get
    oob(idAt + 5) = 9 // width 9 > screen 4 (little-endian low byte)
    assert(Multimodal.decodeGifFrames(oob).isEmpty)
    // single-frame GIFs still work through the animation walk
    val single = Multimodal.encodeGifPixels(4, 4, Array[Byte](1, 2, 3))
    assert(Multimodal.decodeGifFrames(single).exists(_.nFrames == 1))
  }
}
