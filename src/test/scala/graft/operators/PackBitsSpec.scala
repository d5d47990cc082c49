package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** PackBits RLE + the compressed-TIFF strip path: codec round trips,
  * control-byte semantics, run caps, and corrupted-stream rejection. */
class PackBitsSpec extends AnyFunSuite {
  import Multimodal.{packBitsDecode, packBitsEncode}

  private def roundTrip(raw: Array[Byte]): Unit = {
    val enc = packBitsEncode(raw)
    assert(packBitsDecode(enc, 0, enc.length, raw.length)
      .map(_.toSeq).contains(raw.toSeq))
  }

  test("codec round-trips runs, literals and mixtures") {
    roundTrip(Array.fill[Byte](7)(9))
    roundTrip(Array[Byte](1, 2, 3, 4, 5))
    roundTrip(Array[Byte](1, 1, 2, 2, 3, 3)) // 2-runs stay literal
    roundTrip("aaaabcccdddddefg".getBytes("US-ASCII"))
    roundTrip(Array.tabulate[Byte](1000)(i => ((i / 4) % 251).toByte))
    roundTrip(Array.fill[Byte](300)(5)) // run cap at 128 forces splits
    roundTrip(Array.tabulate[Byte](200)(i => i.toByte)) // literal cap
  }

  test("runs of >=3 actually compress") {
    val raw = Array.fill[Byte](128)(7)
    assert(packBitsEncode(raw).length == 2)
  }

  test("decoder honors the -128 no-op and rejects corruption") {
    // hand-built: no-op, 3-run of 'a', 2 literals
    val enc = Array[Byte](-128, -2, 'a', 1, 'b', 'c')
    assert(packBitsDecode(enc, 0, enc.length, 5)
      .map(new String(_, "US-ASCII")).contains("aaabc"))
    // wrong expected length
    assert(packBitsDecode(enc, 0, enc.length, 6).isEmpty)
    // literal header overruns the input
    assert(packBitsDecode(Array[Byte](5, 'x'), 0, 2, 6).isEmpty)
    // run header with no run byte
    assert(packBitsDecode(Array[Byte](-3), 0, 1, 4).isEmpty)
    // output overrun
    assert(packBitsDecode(Array[Byte](-127, 'z'), 0, 2, 10).isEmpty)
  }

  test("PackBits TIFF round-trips both endians and multiple strips") {
    for (le <- Seq(true, false); h <- Seq(3, 11)) { // 11 rows = 3 strips
      val w = 5
      val px = Array.tabulate[Byte](w * h * 3)(k => ((k / 4) % 91 + 32).toByte)
      val tiff = Multimodal.encodeTiffPixelsPackBits(w, h, le, px)
      val Some((dw, dh, rgb)) = Multimodal.decodeTiffPixels(tiff)
      assert((dw, dh) == ((w, h)))
      assert(rgb.toSeq == px.toSeq)
      // compressed strips are smaller than raw for 4x-repeated bytes
      assert(tiff.length < 122 + 6 + 8 * 3 + w * h * 3)
    }
  }

  test("corrupted PackBits strip data rejects instead of throwing") {
    val px = Array.tabulate[Byte](60)(k => (k / 4).toByte)
    val tiff = Multimodal.encodeTiffPixelsPackBits(4, 5, true, px)
    // stomp the first strip's first control byte into a huge literal
    val offs = java.nio.ByteBuffer.wrap(tiff)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // find strip data start: after IFD(122) + bps(6) + offs/cnts(2*4*2)
    val dataAt = 122 + 6 + 2 * 4 * 2
    val bad = tiff.clone()
    bad(dataAt) = 127 // claims 128 literals; strip is far shorter
    assert(Multimodal.decodeTiffPixels(bad).isEmpty)
    assert(offs.getShort(2) == 42) // silence unused warning
  }
}
