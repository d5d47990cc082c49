package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Layer I codec pins: hand-computed requantization on a one-subband
  * frame, zero-code negative amplitudes, the malformed-input walk
  * rules, and the non-power-of-two scalefactor path. */
class MpegAudioSpec extends AnyFunSuite {

  private def oneSubbandFrame(code: Int, scfIdx: Int = 0): Array[Byte] = {
    val allocs = Array.tabulate(32)(sb => if (sb == 0) 1 else 0) // nb = 2
    val scf = Array.tabulate(32)(_ => scfIdx)
    val codes = Array.tabulate(32)(sb =>
      Array.fill(12)(if (sb == 0) code else 0))
    MpegAudio.encodeFrame(allocs, scf, codes)
  }

  test("hand-computed requantization: nb=2, sf=2, full-scale code") {
    // c=3: s2 = 3/2 - 1 + 1/2 = 1.0; v = 1.0 * (4/3) * 2 = 8/3
    val dec = MpegAudio.decode(oneSubbandFrame(3))
    assert(dec.size == 1)
    assert(dec.head.nActive == 1)
    assert(dec.head.sumCodes == 36L) // 12 * 3
    assert(dec.head.ampMicro == 12L * 2666667L)
  }

  test("zero code is the most negative level") {
    // c=0: s2 = -1 + 1/2 = -0.5; v = -0.5 * 4/3 * 2 = -4/3
    val dec = MpegAudio.decode(oneSubbandFrame(0))
    assert(dec.head.ampMicro == 12L * -1333333L)
  }

  test("frames concatenate; trailing garbage and truncation stop the walk") {
    val f = oneSubbandFrame(2)
    assert(MpegAudio.decode(f ++ f).size == 2)
    assert(MpegAudio.decode(f ++ f.take(50)).size == 1)
    assert(MpegAudio.decode(f ++ Array[Byte](1, 2, 3)).size == 1)
    assert(MpegAudio.decode(Array[Byte](0x12, 0x34, 0x56, 0x78)).isEmpty)
    assert(MpegAudio.decode(Array.emptyByteArray).isEmpty)
  }

  test("forbidden allocation 15 rejects the frame") {
    val allocs = Array.tabulate(32)(sb => if (sb == 0) 15 else 0)
    val bad = MpegAudio.encodeFrame(allocs, Array.fill(32)(0),
      Array.fill(32)(Array.fill(12)(0)))
    assert(MpegAudio.decode(bad).isEmpty)
  }

  test("non-multiple-of-3 scalefactors decode through the 2^(-1/3) steps") {
    val dec = MpegAudio.decode(oneSubbandFrame(3, scfIdx = 1))
    // sf(1) = 2 * 2^(-1/3) < sf(0) = 2 → strictly smaller amplitude
    val ref = MpegAudio.decode(oneSubbandFrame(3, scfIdx = 0))
    assert(dec.head.ampMicro > 0 && dec.head.ampMicro < ref.head.ampMicro)
  }
}
