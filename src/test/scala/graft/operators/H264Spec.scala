package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** H.264 Annex B / SPS pins: Exp-Golomb round trips, cropped
  * dimension recovery, emulation-prevention escaping, start-code
  * walks (3- and 4-byte), and the malformed-input rules. */
class H264Spec extends AnyFunSuite {

  test("SPS round-trips exact dimensions, multiple-of-16 and cropped") {
    for ((w, h) <- Seq((64, 32), (16, 16), (62, 34), (2, 2), (640, 480),
        (1918, 1080))) {
      val (pw, ph) = H264.parseSps(H264.buildSps(w, h))
      assert((pw, ph) == (w, h), s"$w x $h")
    }
  }

  test("emulation prevention: 00 00 0x sequences escape and round-trip") {
    val patterns = Seq(
      Array[Byte](0, 0, 0),
      Array[Byte](0, 0, 1),
      Array[Byte](0, 0, 2),
      Array[Byte](0, 0, 3),
      Array[Byte](1, 0, 0, 0, 0, 1, 7),
      Array[Byte](0, 0, 4) // above 3: must NOT escape
    )
    patterns.foreach { p =>
      val esc = H264.escape(p)
      assert(H264.unescape(esc).toSeq == p.toSeq, p.toSeq.toString)
      // no start code survives in the escaped form
      assert(!esc.toSeq.sliding(3).exists(_ == Seq[Byte](0, 0, 1)))
    }
    assert(H264.escape(Array[Byte](0, 0, 4)).toSeq == Seq[Byte](0, 0, 4))
  }

  test("Annex B walk: NAL classification and first-SPS dims") {
    val stream = H264.buildNal(3, 7, H264.buildSps(62, 34)) ++
      H264.buildNal(3, 8, H264.buildPps()) ++
      H264.buildNal(3, 5, Array[Byte](0x41, 0x42)) ++
      H264.buildNal(2, 1, Array[Byte](0x43)) ++
      H264.buildNal(2, 1, Array[Byte](0x44))
    val f = H264.parse(stream)
    assert(f.width == 62 && f.height == 34)
    assert(f.nNals == 5 && f.nSps == 1 && f.nPps == 1)
    assert(f.nIdr == 1 && f.nVcl == 3)
  }

  test("3-byte start codes walk identically") {
    // rebuild the stream with 00 00 01 starts (drop the leading zero)
    val four = H264.buildNal(3, 7, H264.buildSps(32, 32))
    val three = four.drop(1)
    assert(three.take(3).toSeq == Seq[Byte](0, 0, 1))
    val f = H264.parse(three ++ three)
    assert(f.nSps == 2 && f.width == 32 && f.height == 32)
  }

  test("no SPS or malformed SPS reports -1 dims; walk never throws") {
    val f = H264.parse(H264.buildNal(2, 1, Array[Byte](9)))
    assert(f.width == -1 && f.height == -1 && f.nVcl == 1)
    // truncated SPS payload
    val g = H264.parse(H264.buildNal(3, 7, Array[Byte](66, 0)))
    assert(g.width == -1 && g.nSps == 1)
    assert(H264.parse(Array.emptyByteArray).nNals == 0)
    assert(H264.parse(Array[Byte](0, 0)).nNals == 0)
  }
}
