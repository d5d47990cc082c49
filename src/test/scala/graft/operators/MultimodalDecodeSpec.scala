package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Real pure-JVM decoders behind the multimodal plumbing: BMP and P6 PPM
  * header parsing, RIFF/WAVE PCM chunk walking, and the malformed-payload
  * sentinel behavior (a poisoned record must flag itself, not throw). */
class MultimodalDecodeSpec extends AnyFunSuite {

  test("BMP round-trip: encode then real header decode") {
    for ((w, h) <- Seq((1, 1), (7, 3), (64, 64), (640, 480))) {
      val bmp = Multimodal.encodeBmp(w, h, Array[Byte](1, 2, 3))
      assert(Multimodal.decodeBmp(bmp).contains((w, h)), s"${w}x$h")
      // container size arithmetic: header + padded rows
      assert(bmp.length == 54 + ((w * 3 + 3) / 4) * 4 * h)
    }
  }

  test("BMP: top-down (negative height) decodes to magnitude") {
    val bmp = Multimodal.encodeBmp(5, 4, Array[Byte](9))
    val b = java.nio.ByteBuffer.wrap(bmp)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(22, -4)
    assert(Multimodal.decodeBmp(bmp).contains((5, 4)))
  }

  test("BMP malformed: short buffer, wrong magic, zero/negative width") {
    assert(Multimodal.decodeBmp(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeBmp("BM12".getBytes).isEmpty) // truncated
    val good = Multimodal.encodeBmp(5, 4, Array[Byte](9))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(Multimodal.decodeBmp(badMagic).isEmpty)
    val zeroW = good.clone()
    java.nio.ByteBuffer.wrap(zeroW)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(18, 0)
    assert(Multimodal.decodeBmp(zeroW).isEmpty)
  }

  test("PPM: P6 grammar incl. comments and arbitrary whitespace") {
    val ppm = "P6\n# a comment\n640  480\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 2)
    assert(Multimodal.decodePpm(ppm).contains((640, 480)))
    assert(Multimodal.decodePpm("P6 2 3 255 ".getBytes).contains((2, 3)))
    assert(Multimodal.decodePpm("P5 2 3 255 ".getBytes).isEmpty) // not P6
    assert(Multimodal.decodePpm("P6\n640".getBytes).isEmpty) // truncated
    assert(Multimodal.decodePpm("P6 0 3 255 ".getBytes).isEmpty) // zero dim
    // adversarial digit run longer than any valid dimension must decode
    // to None, not throw NumberFormatException and kill the task
    assert(Multimodal.decodePpm("P6 99999999999999 3 255 ".getBytes).isEmpty)
    assert(Multimodal.decode("image/x-portable-pixmap",
      "P6 99999999999999 3 255 ".getBytes) == ((-1, -1)))
  }

  test("WAV round-trip: encode 8-bit PCM, decode format + sample stats") {
    val samples = "Hello, WAV!".getBytes("US-ASCII")
    val wav = Multimodal.encodeWavPcm8(8000, samples)
    val i = Multimodal.wavStats(wav).get
    assert(i.sampleRate == 8000 && i.channels == 1 && i.bitsPerSample == 8)
    assert(i.nSamples == samples.length)
    assert(i.sumAbs == samples.map(b => math.abs((b & 0xff) - 128)).sum)
  }

  test("WAV: chunk walker skips unknown chunks before fmt/data") {
    val samples = Array[Byte](10, 20, 30)
    val wav = Multimodal.encodeWavPcm8(44100, samples)
    // splice a LIST chunk between WAVE and fmt
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = wav.take(12) ++ extra ++ wav.drop(12)
    val b = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(4, spliced.length - 8) // fix RIFF size
    val i = Multimodal.wavStats(spliced).get
    assert(i.sampleRate == 44100 && i.nSamples == 3)
  }

  test("WAV malformed: bad magic, truncated chunk, non-PCM format") {
    assert(Multimodal.wavStats(Array.emptyByteArray).isEmpty)
    assert(Multimodal.wavStats("RIFXxxxxWAVE".getBytes).isEmpty)
    val wav = Multimodal.encodeWavPcm8(8000, Array[Byte](1, 2, 3))
    assert(Multimodal.wavStats(wav.dropRight(2)).isEmpty) // truncated data
    val nonPcm = wav.clone()
    java.nio.ByteBuffer.wrap(nonPcm)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(20, 7) // µ-law
    assert(Multimodal.wavStats(nonPcm).isEmpty)
  }

  test("kind dispatch: real decoders for BMP/PPM, stub otherwise, " +
    "sentinel on malformed") {
    val bmp = Multimodal.encodeBmp(3, 2, Array[Byte](5))
    assert(Multimodal.decode("image/bmp", bmp) == ((3, 2)))
    assert(Multimodal.decode("image/bmp", "garbage".getBytes) == ((-1, -1)))
    val ppm = "P6 4 5 255 ".getBytes
    assert(Multimodal.decode("image/x-portable-pixmap", ppm) == ((4, 5)))
    val blob = Array.fill[Byte](130)(7)
    assert(Multimodal.decode("application/octet-stream", blob) ==
      Multimodal.decodeStub(blob))
  }
}
