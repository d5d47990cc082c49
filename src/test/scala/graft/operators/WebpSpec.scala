package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** WebP dimension walk: all three dimension-bearing chunk layouts,
  * unknown-chunk skipping and malformed rejection. */
class WebpSpec extends AnyFunSuite {

  private val payload = "sample body".getBytes("US-ASCII")

  test("VP8 / VP8L / VP8X variants round-trip dimensions") {
    for (v <- Seq("VP8 ", "VP8L", "VP8X"); (w, h) <- Seq((1, 1),
      (640, 480), (16383, 2))) {
      val webp = Multimodal.encodeWebp(v, w, h, payload)
      assert(Multimodal.decodeWebpDims(webp).contains((w, h)),
        s"variant $v dims ${w}x$h")
    }
  }

  test("unknown chunks before the bitstream chunk are skipped") {
    val inner = Multimodal.encodeWebp("VP8L", 33, 44, payload)
    // rebuild: RIFF WEBP [JUNK len 5 bytes pad] [VP8L ...]
    val vp8l = java.util.Arrays.copyOfRange(inner, 12, inner.length)
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val size = 4 + junk.length + vp8l.length
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(Array[Byte]((size & 0xff).toByte, ((size >> 8) & 0xff).toByte,
      ((size >> 16) & 0xff).toByte, ((size >> 24) & 0xff).toByte))
    out.write("WEBP".getBytes("US-ASCII"))
    out.write(junk); out.write(vp8l)
    assert(Multimodal.decodeWebpDims(out.toByteArray).contains((33, 44)))
  }

  test("malformed containers reject") {
    val good = Multimodal.encodeWebp("VP8 ", 12, 34, payload)
    assert(Multimodal.decodeWebpDims(good).contains((12, 34)))
    val notWebp = good.clone(); notWebp(8) = 'X'
    assert(Multimodal.decodeWebpDims(notWebp).isEmpty)
    val badStart = good.clone(); badStart(23) = 0 // stomp 0x9D012A
    assert(Multimodal.decodeWebpDims(badStart).isEmpty)
    val interFrame = good.clone(); interFrame(20) = 1 // keyframe bit
    assert(Multimodal.decodeWebpDims(interFrame).isEmpty)
    assert(Multimodal.decodeWebpDims(good.take(19)).isEmpty)
    val badSig = Multimodal.encodeWebp("VP8L", 5, 5, payload).clone()
    badSig(20) = 0x30 // VP8L signature byte
    assert(Multimodal.decodeWebpDims(badSig).isEmpty)
  }
}
