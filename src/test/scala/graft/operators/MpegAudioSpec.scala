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

  // ── Layer II ────────────────────────────────────────────────────

  private def l2Frame(sb: Int, idx: Int, sample: Int, scfsi: Int = 0,
      scfSlots: Array[Int] = Array(0, 0, 0)): Array[Byte] = {
    val allocIdx = Array.fill(MpegAudio.L2SbLimit)(0)
    val sc = Array.fill(MpegAudio.L2SbLimit)(0)
    val scf = Array.fill(MpegAudio.L2SbLimit)(Array(0, 0, 0))
    val smp = Array.fill(MpegAudio.L2SbLimit)(Array.fill(36)(0))
    allocIdx(sb) = idx
    sc(sb) = scfsi
    scf(sb) = scfSlots
    smp(sb) = Array.fill(36)(sample)
    MpegAudio.encodeFrameL2(allocIdx, sc, scf, smp)
  }

  test("Table 3-B.2a classes: nbal widths and step lists") {
    assert(MpegAudio.l2Nbal(0) == 4 && MpegAudio.l2Nbal(10) == 4)
    assert(MpegAudio.l2Nbal(11) == 3 && MpegAudio.l2Nbal(22) == 3)
    assert(MpegAudio.l2Nbal(23) == 2 && MpegAudio.l2Nbal(26) == 2)
    assert(MpegAudio.l2Steps(0, 2) == 7)    // low class skips 5
    assert(MpegAudio.l2Steps(4, 2) == 5)    // mid class has it
    assert(MpegAudio.l2Steps(12, 7) == 65535)
    assert(MpegAudio.l2Steps(24, 3) == 65535)
    assert(MpegAudio.l2Steps(5, 0) == 0)    // 0 = silent
  }

  test("L2 hand-computed: ungrouped 7-step full-scale, sf = 2") {
    // sb 0 idx 2 → m = 7, nb = 3, g = 8; c = 6:
    // v = (6/4 - 1 + 2/8) * (8/7) * 2 = 0.75 * 8/7 * 2 = 12/7
    val dec = MpegAudio.decodeL2(l2Frame(0, 2, 6))
    assert(dec.size == 1)
    assert(dec.head.nActive == 1 && dec.head.nGrouped == 0L)
    assert(dec.head.sumCodes == 36L * 6)
    assert(dec.head.ampMicro == 36L * 1714286L)
  }

  test("L2 grouped 3-step: codeword packing round-trips, D = 0.5") {
    // sb 4 idx 1 → m = 3 grouped, nb = 2, g = 4; c = 2:
    // v = (2/2 - 1 + 0.5) * (4/3) * 2 = 4/3
    val dec = MpegAudio.decodeL2(l2Frame(4, 1, 2))
    assert(dec.head.nGrouped == 12L) // one codeword per granule
    assert(dec.head.sumCodes == 36L * 2)
    assert(dec.head.ampMicro == 36L * 1333333L)
    // c = 1 is the exact zero level: (1/2 - 1 + 0.5) = 0
    assert(MpegAudio.decodeL2(l2Frame(4, 1, 1)).head.ampMicro == 0L)
  }

  test("L2 scfsi sharing: parts map onto the transmitted slots") {
    // slots (0, 3, 6) → sf = 2·2^(−idx/3) = (2, 1, 0.5); constant
    // full-scale m=3 c=2; per part amp = 12 samples * (4/3) * sf
    def amp(scfsi: Int): Long =
      MpegAudio.decodeL2(
        l2Frame(4, 1, 2, scfsi, Array(0, 3, 6))).head.ampMicro
    val u = 1333333L // one sample at sf=2
    assert(amp(0) == 12 * u + 12 * (u / 2 + 1) + 12 * (u / 4)) // 2,1,.5
    assert(amp(2) == 36 * u)                                   // all sf=2
    // scfsi=1: parts 0,1 share slot 0; part 2 keeps slot 2
    assert(amp(1) == 24 * u + 12 * (u / 4))
    // scfsi=3: part 0 slot 0; parts 1,2 share slot 1
    assert(amp(3) == 12 * u + 24 * (u / 2 + 1))
  }

  test("L2 walk rules: concat, truncation, non-B.2a header") {
    val f = l2Frame(0, 2, 3)
    assert(f.length == MpegAudio.L2FrameBytes)
    assert(MpegAudio.decodeL2(f ++ f).size == 2)
    assert(MpegAudio.decodeL2(f ++ f.take(100)).size == 1)
    assert(MpegAudio.decodeL2(Array[Byte](1, 2, 3, 4)).isEmpty)
    // a Layer I frame must not decode as Layer II
    assert(MpegAudio.decodeL2(oneSubbandFrame(3)).isEmpty)
  }
}
