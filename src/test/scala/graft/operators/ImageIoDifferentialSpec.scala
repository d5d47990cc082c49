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
