package graft.operators

import java.io.ByteArrayInputStream
import org.scalatest.funsuite.AnyFunSuite

/** Differential validation of the pure-JVM image codecs against the
  * JDK's OWN ImageIO decoders — external evidence the containers are
  * real, not merely self-consistent: PNG and GIF are lossless so the
  * pixel comparison is EXACT in both directions (our encoder → their
  * decoder, their encoder → our decoder); JPEG compares within an
  * IDCT-rounding tolerance on the DC-only fixture streams. */
class ImageIoDifferentialSpec extends AnyFunSuite {

  private def pix(n: Int, seed: Long): Array[Byte] = {
    val r = new java.util.Random(seed)
    val b = new Array[Byte](n)
    r.nextBytes(b)
    b
  }

  test("PNG: our encoder's bytes decode pixel-identically under ImageIO") {
    for (seed <- 1 to 8) {
      val (w, h) = (5 + seed, 3 + seed % 7)
      val png = Multimodal.encodePngPixels(w, h, pix(w * h * 3, seed))
      val Some((dw, dh, rgb)) = Multimodal.decodePngPixels(png)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(png))
      assert(img != null && img.getWidth == dw && img.getHeight == dh)
      for (y <- 0 until dh; x <- 0 until dw) {
        val p = img.getRGB(x, y)
        val i = (y * dw + x) * 3
        assert(((p >> 16) & 0xff) == (rgb(i) & 0xff) &&
          ((p >> 8) & 0xff) == (rgb(i + 1) & 0xff) &&
          (p & 0xff) == (rgb(i + 2) & 0xff), s"seed $seed px ($x,$y)")
      }
    }
  }

  test("PNG: ImageIO-WRITTEN files decode exactly under OUR decoder") {
    for (seed <- 1 to 8) {
      val (w, h) = (4 + seed, 2 + seed % 5)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val src = pix(w * h * 3, 100 + seed)
      for (y <- 0 until h; x <- 0 until w) {
        val i = (y * w + x) * 3
        img.setRGB(x, y, ((src(i) & 0xff) << 16) |
          ((src(i + 1) & 0xff) << 8) | (src(i + 2) & 0xff))
      }
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out))
      val Some((dw, dh, rgb)) = Multimodal.decodePngPixels(out.toByteArray)
      assert(dw == w && dh == h)
      for (k <- 0 until w * h * 3)
        assert((rgb(k) & 0xff) == (src(k) & 0xff), s"seed $seed byte $k")
    }
  }

  test("gray/palette PNG: ours read by ImageIO; ImageIO's read by ours") {
    // our grayscale PNG under ImageIO
    val (w, h) = (9, 7)
    val gray = Array.tabulate[Byte](w * h)(i => ((i * 37) % 256).toByte)
    val gpng = Multimodal.encodePngGray(w, h, gray)
    val gimg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gpng))
    assert(gimg != null && gimg.getWidth == w && gimg.getHeight == h)
    // raw raster samples — getRGB would run the gray→sRGB conversion
    for (y <- 0 until h; x <- 0 until w)
      assert(gimg.getRaster.getSample(x, y, 0) == (gray(y * w + x) & 0xff),
        s"gray ($x,$y)")
    // our palette PNG under ImageIO
    val pal = Array.tabulate[Byte](7 * 3) { k =>
      val e = k / 3
      (k % 3 match {
        case 0 => e * 30
        case 1 => (e * 60) % 256
        case _ => (e * 90) % 256
      }).toByte
    }
    val idx = Array.tabulate[Byte](w * h)(i => (i % 7).toByte)
    val ppng = Multimodal.encodePngPalette(w, h, pal, idx)
    val pimg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ppng))
    assert(pimg != null && pimg.getWidth == w)
    for (y <- 0 until h; x <- 0 until w) {
      val e = idx(y * w + x) * 3
      val want = 0xff000000 | ((pal(e) & 0xff) << 16) |
        ((pal(e + 1) & 0xff) << 8) | (pal(e + 2) & 0xff)
      assert(pimg.getRGB(x, y) == want, s"palette ($x,$y)")
    }
    // ImageIO-written grayscale under OUR decoder
    val gb = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) // raw samples, no conversion
      gb.getRaster.setSample(x, y, 0, (x * 29 + y * 53) % 256)
    val gout = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gb, "png", gout))
    val got = Multimodal.decodePngPixels(gout.toByteArray)
    assert(got.isDefined, "our decoder rejected an ImageIO gray PNG")
    val (dw, dh, rgb) = got.get
    assert(dw == w && dh == h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 29 + y * 53) % 256
      val at = (y * w + x) * 3
      assert(v == (rgb(at) & 0xff) && v == (rgb(at + 1) & 0xff) &&
        v == (rgb(at + 2) & 0xff), s"io-gray ($x,$y)")
    }
    // ImageIO-written INDEXED (palette) under OUR decoder
    val ib = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w)
      ib.setRGB(x, y, ((x * 40) << 16) | ((y * 36 % 256) << 8) | 128)
    val iout = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(ib, "png", iout))
    val got2 = Multimodal.decodePngPixels(iout.toByteArray)
    assert(got2.isDefined, "our decoder rejected an ImageIO indexed PNG")
    for (y <- 0 until h; x <- 0 until w) {
      val want = ib.getRGB(x, y) // already palette-quantized
      val at = (y * w + x) * 3
      assert(((want >> 16) & 0xff) == (got2.get._3(at) & 0xff) &&
        ((want >> 8) & 0xff) == (got2.get._3(at + 1) & 0xff) &&
        (want & 0xff) == (got2.get._3(at + 2) & 0xff), s"io-idx ($x,$y)")
    }
  }

  test("Adam7 PNG: interlaced streams decode exactly — ours and ImageIO's") {
    for (seed <- 1 to 8) {
      // spans sub-pass-grid sizes (w or h < 8 empties some passes)
      val (w, h) = (1 + seed * 3 % 19, 1 + seed * 5 % 13)
      val src = pix(w * h * 3, 50 + seed)
      val png = Multimodal.encodePngPixelsAdam7(w, h, src)
      val Some((dw, dh, rgb)) = Multimodal.decodePngPixels(png)
      assert(dw == w && dh == h)
      // the interlace layout must be invisible: same raster as the
      // sequential encoder's
      val Some((_, _, seq0)) =
        Multimodal.decodePngPixels(Multimodal.encodePngPixels(w, h, src))
      assert(rgb.toSeq == seq0.toSeq, s"seed $seed raster drift")
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(png))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        val i = (y * w + x) * 3
        assert(((p >> 16) & 0xff) == (rgb(i) & 0xff) &&
          ((p >> 8) & 0xff) == (rgb(i + 1) & 0xff) &&
          (p & 0xff) == (rgb(i + 2) & 0xff), s"seed $seed px ($x,$y)")
      }
    }
  }

  test("GIF: our palette streams decode pixel-identically under ImageIO") {
    for (seed <- 1 to 8) {
      val (w, h) = (6 + seed, 4 + seed % 6)
      val gif = Multimodal.encodeGifPixels(w, h, pix(w * h, seed))
      val Some((dw, dh, rgb)) = Multimodal.decodeGifPixels(gif)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(gif))
      assert(img != null && img.getWidth == dw && img.getHeight == dh)
      for (y <- 0 until dh; x <- 0 until dw) {
        val p = img.getRGB(x, y)
        val i = (y * dw + x) * 3
        assert(((p >> 16) & 0xff) == (rgb(i) & 0xff) &&
          ((p >> 8) & 0xff) == (rgb(i + 1) & 0xff) &&
          (p & 0xff) == (rgb(i + 2) & 0xff), s"seed $seed px ($x,$y)")
      }
    }
  }

  test("JPEG: our streams decode within IDCT tolerance under ImageIO") {
    for (seed <- 1 to 4) {
      val payload = pix(64, seed).map(b => (b & 0x7f).toByte)
      val jpg = Jpeg.encodePixels(2 + seed % 3, 1 + seed % 3, payload)
      val Some((dw, dh, ours)) = Jpeg.decodePixels(jpg)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(jpg))
      assert(img != null && img.getWidth == dw && img.getHeight == dh)
      var maxDiff = 0
      for (y <- 0 until dh; x <- 0 until dw) {
        val p = img.getRGB(x, y)
        val i = (y * dw + x) * 3
        maxDiff = math.max(maxDiff, math.abs(((p >> 16) & 0xff) -
          (ours(i) & 0xff)))
        maxDiff = math.max(maxDiff, math.abs(((p >> 8) & 0xff) -
          (ours(i + 1) & 0xff)))
        maxDiff = math.max(maxDiff,
          math.abs((p & 0xff) - (ours(i + 2) & 0xff)))
      }
      // both sides decode DC-only blocks; implementations differ only
      // by IDCT/color rounding
      assert(maxDiff <= 2, s"seed $seed maxDiff $maxDiff")
    }
  }
}
