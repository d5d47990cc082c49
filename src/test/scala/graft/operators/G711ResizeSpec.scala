package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** G.711 companded audio expansion and the real box-filter image
  * resize. The expansion tables are pinned by an INDEPENDENT segment-
  * search compressor (round trip over all 256 codes), plus the known
  * anchor values from the G.711 tables; resize is pinned by exact
  * integer expectations and the full decode→downsample→re-encode→
  * decode round trip. */
class G711ResizeSpec extends AnyFunSuite {

  /** Independent µ-law compressor: search the segment table directly
    * (no shared code with the production expand). */
  private def ulawCompress(pcm: Int): Int = {
    val BIAS = 0x84
    val sign = if (pcm < 0) 0x80 else 0
    var mag = math.min(math.abs(pcm) + BIAS, 0x7FFF)
    var seg = 0
    while (seg < 8 && mag > (0xFF << seg)) seg += 1
    val mant = (mag >> (seg + 3)) & 0x0F
    ~(sign | (seg << 4) | mant) & 0xFF
  }

  /** Independent A-law compressor. */
  private def alawCompress(pcm: Int): Int = {
    val sign = if (pcm >= 0) 0x80 else 0
    var mag = math.min(math.abs(pcm), 0x7FFF)
    var seg = 0
    while (seg < 8 && mag > (0xFF << seg)) seg += 1
    val mant =
      if (seg < 2) (mag >> 4) & 0x0F
      else (mag >> (seg + 3)) & 0x0F
    (sign | (seg << 4) | mant) ^ 0x55
  }

  test("u-law: all 256 codes round-trip through an independent compressor") {
    for (code <- 0 until 256) {
      val pcm = Multimodal.ulawExpand(code)
      assert(math.abs(pcm) <= 32124, s"code $code magnitude")
      val back = ulawCompress(pcm)
      // the one lawful ambiguity: −0 (0x7F) and +0 (0xFF) both expand
      // to 0; the canonical compressor emits +0
      assert(back == code || (pcm == 0 && back == 0xFF),
        s"code $code -> $pcm -> $back")
    }
  }

  test("A-law: all 256 codes round-trip through an independent compressor") {
    for (code <- 0 until 256) {
      val pcm = Multimodal.alawExpand(code)
      assert(math.abs(pcm) <= 32256, s"code $code magnitude")
      val back = alawCompress(pcm)
      assert(back == code, s"code $code -> $pcm -> $back")
    }
  }

  test("G.711 table anchors") {
    assert(Multimodal.ulawExpand(0xFF) == 0)      // +0
    assert(Multimodal.ulawExpand(0x7F) == 0)      // −0
    assert(Multimodal.ulawExpand(0x80) == 32124)  // max positive
    assert(Multimodal.ulawExpand(0x00) == -32124) // max negative
    assert(Multimodal.alawExpand(0xD5) == 8)      // +min
    assert(Multimodal.alawExpand(0x55) == -8)     // −min
    assert(Multimodal.alawExpand(0xAA) == 32256)  // max positive
    assert(Multimodal.alawExpand(0x2A) == -32256) // max negative
  }

  test("companded WAV round trip: stats equal a direct expansion fold") {
    val rnd = new scala.util.Random(5)
    for (aLaw <- Seq(false, true)) {
      val codes = Array.fill(300)(rnd.nextInt(256).toByte)
      val wav = Multimodal.encodeWavG711(8000, aLaw, codes)
      val Some(info) = Multimodal.g711Stats(wav)
      val pcm = codes.map(b =>
        if (aLaw) Multimodal.alawExpand(b & 0xff)
        else Multimodal.ulawExpand(b & 0xff))
      assert(info.format == (if (aLaw) 6 else 7))
      assert(info.sampleRate == 8000)
      assert(info.nSamples == 300)
      assert(info.sumPcm == pcm.map(_.toLong).sum)
      assert(info.sumAbs == pcm.map(v => math.abs(v).toLong).sum)
      assert(info.peak == pcm.map(math.abs).max)
    }
  }

  test("the PCM and G.711 WAV gates stay disjoint") {
    val pcm = Multimodal.encodeWavPcm8(8000, Array[Byte](1, 2, 3))
    val ulaw = Multimodal.encodeWavG711(8000, aLaw = false, Array[Byte](1, 2, 3))
    assert(Multimodal.g711Stats(pcm).isEmpty, "format 1 is not companded")
    assert(Multimodal.wavStats(ulaw).isEmpty, "format 7 is not PCM")
    assert(Multimodal.g711Stats(Array.emptyByteArray).isEmpty)
    assert(Multimodal.g711Stats("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  test("boxDownsample: exact floor averages, any factor") {
    // 4×2 image, channel-distinct values
    val rgb = new Array[Byte](4 * 2 * 3)
    for (y <- 0 until 2; x <- 0 until 4; c <- 0 until 3)
      rgb((y * 4 + x) * 3 + c) = (10 * (y * 4 + x) + c).toByte
    val Some((w2, h2, out)) = Multimodal.boxDownsample(4, 2, rgb, 2)
    assert(w2 == 2 && h2 == 1)
    // box (0,0): pixels 0,1,4,5 → values c + (0+10+40+50)/4 = 25+c
    assert((out(0) & 0xff) == 25 && (out(1) & 0xff) == 26 && (out(2) & 0xff) == 27)
    // box (1,0): pixels 2,3,6,7 → (20+30+60+70)/4 = 45
    assert((out(3) & 0xff) == 45)
    // factor 3 on a 3×3 constant
    val c3 = Array.fill(27)(100.toByte)
    val Some((1, 1, o3)) = Multimodal.boxDownsample(3, 3, c3, 3)
    assert(o3.forall(b => (b & 0xff) == 100))
    // no complete block → None
    assert(Multimodal.boxDownsample(1, 5, new Array[Byte](15), 2).isEmpty)
  }

  test("floor truncation is per-box, not global") {
    // values 0,1,2,3 → (0+1+2+3)/4 = 1 (floor of 1.5)
    val rgb = new Array[Byte](2 * 2 * 3)
    for (i <- 0 until 4; c <- 0 until 3) rgb(i * 3 + c) = i.toByte
    val Some((_, _, out)) = Multimodal.boxDownsample(2, 2, rgb, 2)
    assert(out.forall(_ == 1))
  }
}
