package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayInputStream

/** TIFF-variant LZW (Compression = 5) + horizontal-differencing
  * predictor: codec round trips across width-bump and table-clear
  * boundaries, strip-path round trips for both predictors / endians /
  * multi-strip layouts, a JDK ImageIO differential in BOTH directions
  * (the JDK ships a real TIFF plugin since 9 — external evidence the
  * early-change bit layout is the spec's, not just self-consistent),
  * and corrupted-stream rejection. */
class TiffLzwSpec extends AnyFunSuite {
  import Multimodal.{tiffLzwDecode, tiffLzwEncode}

  private def roundTrip(raw: Array[Byte]): Unit = {
    val enc = tiffLzwEncode(raw)
    assert(tiffLzwDecode(enc, 0, enc.length, raw.length)
      .map(_.toSeq).contains(raw.toSeq), s"len=${raw.length}")
  }

  test("codec round-trips runs, literals, mixtures and empty") {
    roundTrip(Array.emptyByteArray)
    roundTrip(Array[Byte](7))
    roundTrip(Array.fill[Byte](500)(9))
    roundTrip("TOBEORNOTTOBEORTOBEORNOT".getBytes("US-ASCII"))
    roundTrip(Array.tabulate[Byte](4000)(i => ((i * 7) % 253).toByte))
  }

  test("round trip across EVERY width bump and the 4094 table clear") {
    // pseudo-random bytes build ~1 dict entry per 2 inputs: 40 KB
    // crosses 511/1023/2047 and the 4094-entry Clear several times
    val raw = Array.tabulate[Byte](40000) { i =>
      (((i * 2654435761L) >>> 13) & 0xff).toByte
    }
    roundTrip(raw)
    // and a compressible tail after the clear
    roundTrip(raw ++ Array.fill[Byte](5000)(42))
  }

  test("KwKwK case decodes (code == next free slot)") {
    // 'aaaa...' forces the classic cScSc pattern immediately
    roundTrip(Array.fill[Byte](17)('a'.toByte))
  }

  test("predictor differencing inverts exactly") {
    val row = Array.tabulate[Byte](30)(i => ((i * 37) % 256).toByte)
    val orig = row.clone()
    Multimodal.tiffPredict(row, 15)
    assert(!row.sameElements(orig))
    Multimodal.tiffUnpredict(row, 15)
    assert(row.toSeq == orig.toSeq)
  }

  test("LZW TIFF round-trips: predictors, endians, multi-strip") {
    for (le <- Seq(true, false); pred <- Seq(1, 2); h <- Seq(3, 11)) {
      val w = 5
      val px = Array.tabulate[Byte](w * h * 3)(k => ((k / 4) % 91 + 32).toByte)
      val tiff = Multimodal.encodeTiffPixelsLzw(w, h, le, px, pred)
      val got = Multimodal.decodeTiffPixels(tiff)
      assert(got.isDefined, s"le=$le pred=$pred h=$h")
      val (dw, dh, rgb) = got.get
      assert((dw, dh) == ((w, h)))
      assert(rgb.toSeq == px.toSeq, s"le=$le pred=$pred h=$h")
    }
  }

  test("ImageIO reads our LZW TIFFs pixel-identically (both predictors)") {
    for (pred <- Seq(1, 2); le <- Seq(true, false)) {
      val (w, h) = (9, 7)
      val px = Array.tabulate[Byte](w * h * 3)(k => ((k * 11) % 256).toByte)
      val tiff = Multimodal.encodeTiffPixelsLzw(w, h, le, px, pred)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(tiff))
      assert(img != null, s"ImageIO rejected pred=$pred le=$le")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        val at = (y * w + x) * 3
        assert(((p >> 16) & 0xff) == (px(at) & 0xff) &&
          ((p >> 8) & 0xff) == (px(at + 1) & 0xff) &&
          (p & 0xff) == (px(at + 2) & 0xff), s"($x,$y) pred=$pred le=$le")
      }
    }
  }

  test("ImageIO-WRITTEN LZW TIFFs decode exactly under OUR decoder") {
    val (w, h) = (13, 6)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 31) << 16) | ((y * 53 % 256) << 8) |
        ((x * y) % 256))
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("tiff").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("LZW")
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val got = Multimodal.decodeTiffPixels(out.toByteArray)
    assert(got.isDefined, "our decoder rejected an ImageIO LZW TIFF")
    val (dw, dh, rgb) = got.get
    assert((dw, dh) == ((w, h)))
    for (y <- 0 until h; x <- 0 until w) {
      val at = (y * w + x) * 3
      val p = img.getRGB(x, y)
      assert((rgb(at) & 0xff) == ((p >> 16) & 0xff) &&
        (rgb(at + 1) & 0xff) == ((p >> 8) & 0xff) &&
        (rgb(at + 2) & 0xff) == (p & 0xff), s"($x,$y)")
    }
  }

  test("corrupted LZW strips reject instead of throwing") {
    val px = Array.tabulate[Byte](60)(k => (k / 4).toByte)
    val tiff = Multimodal.encodeTiffPixelsLzw(5, 4, littleEndian = true, px)
    val rnd = new scala.util.Random(77)
    for (_ <- 0 until 400) {
      val m = tiff.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      Multimodal.decodeTiffPixels(m) // must not throw
    }
    // truncations at every length
    for (cut <- 0 until tiff.length)
      Multimodal.decodeTiffPixels(
        java.util.Arrays.copyOfRange(tiff, 0, cut))
    // wrong expected length must reject
    val enc = tiffLzwEncode(Array.fill[Byte](32)(1))
    assert(tiffLzwDecode(enc, 0, enc.length, 31).isEmpty)
    assert(tiffLzwDecode(enc, 0, enc.length, 33).isEmpty)
  }
}
