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

  test("JPEG round-trip: SOF marker walk finds dims after variable " +
    "segments") {
    val j = Multimodal.encodeJpegHeader(640, 480, "payload bytes".getBytes)
    assert(Multimodal.decodeJpegDims(j).contains((640, 480)))
    // empty COM payload still parses
    assert(Multimodal.decodeJpegDims(
      Multimodal.encodeJpegHeader(1, 65535, Array.empty)).contains((1, 65535)))
  }

  test("JPEG: progressive SOF2 and fill bytes are handled") {
    val j = Multimodal.encodeJpegHeader(12, 34, Array[Byte](1, 2))
    // rewrite SOF0 (FFC0) to SOF2 (FFC2): same frame-header layout
    val sofAt = j.indexOfSlice(Seq(0xFF.toByte, 0xC0.toByte))
    val prog = j.clone(); prog(sofAt + 1) = 0xC2.toByte
    assert(Multimodal.decodeJpegDims(prog).contains((12, 34)))
    // FF fill bytes before a marker (T.81 §B.1.1.2)
    val filled = (j.take(2) :+ 0xFF.toByte) ++ j.drop(2)
    assert(Multimodal.decodeJpegDims(filled).contains((12, 34)))
  }

  test("JPEG malformed: bad magic, truncation, overrun, SOS/EOI first, " +
    "zero dims") {
    val j = Multimodal.encodeJpegHeader(8, 9, "xy".getBytes)
    assert(Multimodal.decodeJpegDims("garbage".getBytes).isEmpty)
    assert(Multimodal.decodeJpegDims(j.take(3)).isEmpty)
    assert(Multimodal.decodeJpegDims(j.take(25)).isEmpty) // mid-segment cut
    // segment length running past the buffer
    val overrun = j.clone()
    val comAt = overrun.indexOfSlice(Seq(0xFF.toByte, 0xFE.toByte))
    overrun(comAt + 2) = 0x7F.toByte
    assert(Multimodal.decodeJpegDims(overrun).isEmpty)
    // EOI immediately after SOI: no SOF ever seen
    assert(Multimodal.decodeJpegDims(
      Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)).isEmpty)
    // zero width in the frame header
    val zero = j.clone()
    val sofAt = zero.indexOfSlice(Seq(0xFF.toByte, 0xC0.toByte))
    zero(sofAt + 7) = 0; zero(sofAt + 8) = 0
    assert(Multimodal.decodeJpegDims(zero).isEmpty)
  }

  test("PNG round-trip: signature + IHDR decode, container size") {
    for ((w, h) <- Seq((1, 1), (64, 13), (1920, 1080))) {
      val png = Multimodal.encodePng(w, h, "payload".getBytes)
      assert(Multimodal.decodePngDims(png).contains((w, h)), s"${w}x$h")
      assert(png.length == 57 + "payload".length)
    }
  }

  test("PNG malformed: bad magic, short buffer, wrong first chunk, " +
    "zero dims, bogus depth") {
    val png = Multimodal.encodePng(10, 20, Array[Byte](1, 2, 3))
    assert(Multimodal.decodePngDims(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodePngDims(png.take(20)).isEmpty)
    val badMagic = png.clone(); badMagic(1) = 'Q'.toByte
    assert(Multimodal.decodePngDims(badMagic).isEmpty)
    val wrongChunk = png.clone(); wrongChunk(12) = 'X'.toByte
    assert(Multimodal.decodePngDims(wrongChunk).isEmpty)
    val zeroW = png.clone()
    java.nio.ByteBuffer.wrap(zeroW).putInt(16, 0)
    assert(Multimodal.decodePngDims(zeroW).isEmpty)
    val badDepth = png.clone(); badDepth(24) = 3.toByte
    assert(Multimodal.decodePngDims(badDepth).isEmpty)
  }

  test("PNG FULL pixel decode: inflate + defilter recovers the exact " +
    "bytes across all five filter types") {
    val rnd = new scala.util.Random(99L)
    // h ≥ 5 so the fixture's (y mod 5) filter schedule uses every type
    for ((w, h) <- Seq((1, 5), (7, 6), (32, 9), (3, 1))) {
      val pixels = Array.fill[Byte](w * 3 * h)(rnd.nextInt.toByte)
      val png = Multimodal.encodePngPixels(w, h, pixels)
      val (dw, dh, got) = Multimodal.decodePngPixels(png).get
      assert(dw == w && dh == h)
      assert(got.toSeq == pixels.toSeq, s"${w}x$h pixel mismatch")
    }
    // cycling: payload shorter than the raster repeats
    val png = Multimodal.encodePngPixels(4, 7, Array[Byte](10, 20, 30, 40))
    val (_, _, px) = Multimodal.decodePngPixels(png).get
    assert(px.zipWithIndex.forall { case (v, i) =>
      v == Seq(10, 20, 30, 40)(i % 4).toByte })
  }

  test("PNG pixel decode malformed: truncated IDAT, corrupt DEFLATE, " +
    "reserved filter, dims-only container has no IDAT") {
    val good = Multimodal.encodePngPixels(5, 5, Array[Byte](1, 2, 3))
    assert(Multimodal.decodePngPixels(good).isDefined)
    // chop the container mid-IDAT: chunk framing fails
    assert(Multimodal.decodePngPixels(good.dropRight(20)).isEmpty)
    // flip bytes inside IDAT: either the DEFLATE stream or the filter
    // bytes go bad — must reject, never throw
    for (off <- 41 until math.min(good.length - 12, 61)) {
      val bad = good.clone(); bad(off) = (bad(off) ^ 0x55).toByte
      Multimodal.decodePngPixels(bad) // no exception is the assertion
    }
    // the dims-only fixture (payload in a private chunk) has no IDAT:
    // dims still decode, pixels reject on the length check
    val dimsOnly = Multimodal.encodePng(6, 7, Array[Byte](9))
    assert(Multimodal.decodePngDims(dimsOnly).contains((6, 7)))
    assert(Multimodal.decodePngPixels(dimsOnly).isEmpty)
  }

  test("GIF round-trip: logical screen dims, sub-block container size") {
    for ((w, h) <- Seq((1, 1), (320, 200), (65535, 65535))) {
      val gif = Multimodal.encodeGif(w, h, "some comment".getBytes)
      assert(Multimodal.decodeGifDims(gif).contains((w, h)), s"${w}x$h")
    }
    // sub-block framing: 255-byte blocks + length prefixes
    for (n <- Seq(0, 1, 255, 256, 700)) {
      val gif = Multimodal.encodeGif(2, 2, Array.fill[Byte](n)(7))
      assert(gif.length == 17 + n + (n + 254) / 255, s"payload $n")
      assert(Multimodal.decodeGifDims(gif).contains((2, 2)))
    }
  }

  test("GIF malformed: bad magic, short buffer, zero dims") {
    assert(Multimodal.decodeGifDims(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeGifDims("GIF89a".getBytes).isEmpty)
    assert(Multimodal.decodeGifDims("GIF88a0123456789".getBytes).isEmpty)
    val gif = Multimodal.encodeGif(3, 4, Array[Byte](1))
    val zeroW = gif.clone(); zeroW(6) = 0; zeroW(7) = 0
    assert(Multimodal.decodeGifDims(zeroW).isEmpty)
  }

  test("LZW round-trip: greedy encoder vs full decoder, growth + KwKwK") {
    val rnd = new scala.util.Random(77L)
    val cases = Seq(
      Array.emptyByteArray,
      Array[Byte](0),
      Array[Byte](65, 65, 65, 65, 65, 65),           // KwKwK chains
      Array.tabulate[Byte](5000)(i => (i % 3).toByte), // deep table
      Array.fill[Byte](3000)(rnd.nextInt(256).toByte),
      Array.tabulate[Byte](70000)(i => (i % 7).toByte)) // past 4096 freeze
    for ((d, i) <- cases.zipWithIndex) {
      val enc = Multimodal.lzwEncode(8, d)
      val dec = Multimodal.lzwDecode(8, enc, d.length)
      assert(dec.exists(_.sameElements(d)), s"case $i min=8")
    }
    // narrow code size: roots must stay below the clear code (< 4)
    for (d <- Seq(Array[Byte](0, 1, 2, 3, 0, 1, 2, 3),
        Array.tabulate[Byte](9000)(i => (i % 4).toByte))) {
      val enc = Multimodal.lzwEncode(2, d)
      assert(Multimodal.lzwDecode(2, enc, d.length)
        .exists(_.sameElements(d)), "min=2")
    }
    // wrong expected length must reject, not pad or truncate
    val enc = Multimodal.lzwEncode(8, Array[Byte](1, 2, 3))
    assert(Multimodal.lzwDecode(8, enc, 2).isEmpty)
    assert(Multimodal.lzwDecode(8, enc, 4).isEmpty)
    // truncated code stream: bits run out before EOI
    assert(Multimodal.lzwDecode(8, enc.take(2), 3).isEmpty)
    // capacity-boundary TAIL: the decoder adds an entry after the
    // FINAL data code too — when that add lands exactly on 2^width
    // the EOI is read one bit wider, so the encoder's schedule must
    // track the decoder's table, not its own. All-miss inputs (no
    // repeated byte pair) sweep the 512-entry boundary length by
    // length; a schedule off by one at the tail fails one of these.
    for (len <- 248 to 264) {
      val d = Array.tabulate[Byte](len)(i => ((i * 7) % 256).toByte)
      val e = Multimodal.lzwEncode(8, d)
      assert(Multimodal.lzwDecode(8, e, len).exists(_.sameElements(d)),
        s"tail boundary len=$len")
    }
  }

  test("GIF FULL pixel decode: LZW + palette recovers the exact indexed " +
    "pixels through the color ramps") {
    for ((w, h) <- Seq((1, 1), (9, 5), (32, 32))) {
      val idx = Array.tabulate[Byte](math.min(w * h, 97))(i =>
        ((i * 13) % 128).toByte)
      val gif = Multimodal.encodeGifPixels(w, h, idx)
      val (dw, dh, rgb) = Multimodal.decodeGifPixels(gif).get
      assert(dw == w && dh == h)
      for (k <- 0 until w * h) {
        val ci = idx(k % idx.length) & 0xff
        val (r, g, b) = Multimodal.gifPaletteEntry(ci)
        assert((rgb(3 * k) & 0xff) == r && (rgb(3 * k + 1) & 0xff) == g &&
          (rgb(3 * k + 2) & 0xff) == b, s"pixel $k of ${w}x$h")
      }
    }
  }

  test("GIF pixel decode: extensions are skipped, interlace de-passed") {
    val gif = Multimodal.encodeGifPixels(4, 8, Array[Byte](1, 2, 3, 4, 5))
    // splice a graphic-control extension before the image descriptor
    val at = 13 + 768
    val gce = Array(0x21, 0xF9, 4, 0, 0, 0, 0, 0).map(_.toByte)
    val spliced = gif.take(at) ++ gce ++ gif.drop(at)
    assert(Multimodal.decodeGifPixels(spliced).isDefined)
    // interlaced flag: rows land permuted but the SET of rows is equal
    val straight = Multimodal.decodeGifPixels(gif).get._3
    val inter = gif.clone()
    inter(13 + 768 + 9) = 0x40.toByte // image descriptor flags
    val irgb = Multimodal.decodeGifPixels(inter).get._3
    val rows = (0 until 8).map(y => straight.slice(y * 12, y * 12 + 12).toSeq)
    val irows = (0 until 8).map(y => irgb.slice(y * 12, y * 12 + 12).toSeq)
    // pass order 0,8.. 4.. 2,6.. 1,3..: stream row r goes to target row
    val order = Seq(0, 4, 2, 6, 1, 3, 5, 7)
    for ((src, dst) <- order.zipWithIndex.map(p => (p._2, p._1)))
      assert(irows(dst) == rows(src), s"interlace row $dst")
  }

  test("GIF pixel decode malformed: truncation, bad LZW, trailer-first, " +
    "missing color table, out-of-palette index") {
    val gif = Multimodal.encodeGifPixels(6, 6, Array[Byte](1, 2, 3))
    assert(Multimodal.decodeGifPixels(gif).isDefined)
    assert(Multimodal.decodeGifPixels(gif.dropRight(5)).isEmpty)
    // dims-only fixture has no image descriptor at all
    assert(Multimodal.decodeGifPixels(
      Multimodal.encodeGif(6, 6, Array[Byte](1))).isEmpty)
    // no global color table and no local one
    val noGct = gif.clone(); noGct(10) = 0x07.toByte
    assert(Multimodal.decodeGifPixels(noGct).isEmpty)
    // corrupt LZW bytes: reject or survive, never throw
    for (off <- (13 + 768 + 11) until math.min(gif.length - 2, 13 + 768 + 40)) {
      val bad = gif.clone(); bad(off) = (bad(off) ^ 0x5A).toByte
      Multimodal.decodeGifPixels(bad)
    }
  }

  test("TIFF FULL pixel decode: multi-strip reassembly, both byte orders") {
    for (le <- Seq(true, false); (w, h) <- Seq((1, 1), (5, 4), (7, 11))) {
      val px = Array.tabulate[Byte](31)(i => (i * 11).toByte)
      val t = Multimodal.encodeTiffPixels(w, h, le, px)
      val (dw, dh, rgb) = Multimodal.decodeTiffPixels(t).get
      assert(dw == w && dh == h, s"${w}x$h le=$le")
      assert(rgb.indices.forall(i => rgb(i) == px(i % px.length)),
        s"${w}x$h le=$le pixels")
      // h > 4 really uses several strips
      if (h > Multimodal.TiffRowsPerStrip) {
        val b = java.nio.ByteBuffer.wrap(t).order(
          if (le) java.nio.ByteOrder.LITTLE_ENDIAN
          else java.nio.ByteOrder.BIG_ENDIAN)
        // StripOffsets entry (tag 273) carries count = nStrips
        val n = b.getShort(8) & 0xffff
        val cnt = (0 until n).map(j => 10 + j * 12)
          .find(e => (b.getShort(e) & 0xffff) == 273)
          .map(e => b.getInt(e + 4)).get
        assert(cnt == (h + 3) / 4, s"strip count $cnt")
      }
    }
  }

  test("TIFF pixel decode malformed: wrong compression/photometric/bits, " +
    "strip overrun, byte-count mismatch") {
    val t = Multimodal.encodeTiffPixels(5, 6, true, Array[Byte](1, 2, 3))
    assert(Multimodal.decodeTiffPixels(t).isDefined)
    def patched(f: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val c = t.clone()
      f(java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.LITTLE_ENDIAN))
      c
    }
    // entries start at 10; entry j value field at 10 + j*12 + 8
    // order: 256,257,258,259,262,273,277,278,279
    assert(Multimodal.decodeTiffPixels(
      patched(_.putShort(10 + 3 * 12 + 8, 5))).isEmpty)  // LZW compression
    assert(Multimodal.decodeTiffPixels(
      patched(_.putShort(10 + 4 * 12 + 8, 1))).isEmpty)  // grayscale
    assert(Multimodal.decodeTiffPixels(
      patched(_.putShort(10 + 6 * 12 + 8, 1))).isEmpty)  // 1 sample/px
    assert(Multimodal.decodeTiffPixels(t.dropRight(3)).isEmpty) // overrun
    // dims-only fixture (no strip tags) decodes dims but not pixels
    val dimsOnly = Multimodal.encodeTiff(5, 6, true, Array[Byte](9))
    assert(Multimodal.decodeTiffDims(dimsOnly).contains((5, 6)))
    assert(Multimodal.decodeTiffPixels(dimsOnly).isEmpty)
  }

  test("MP3 round-trip: frame walk counts frames, exact duration") {
    for (n <- Seq(1, 3, 16)) {
      val mp3 = Multimodal.encodeMp3(n, "audio payload".getBytes)
      val i = Multimodal.mp3Stats(mp3).get
      assert(i.version == 3 && i.sampleRate == 44100 && i.bitrateKbps == 128)
      assert(i.nFrames == n)
      assert(i.durationMs == n * 1152L * 1000 / 44100)
      assert(mp3.length == n * 417)
    }
  }

  test("MP3: ID3v2 prefix (syncsafe size) and ID3v1 trailer are skipped") {
    val body = Multimodal.encodeMp3(2, Array[Byte](5))
    // ID3v2 header: "ID3", version, flags, syncsafe size 200
    val id3v2 = "ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 1, 72) ++
      Array.fill[Byte](200)(9)
    assert(Multimodal.mp3Stats(id3v2 ++ body).exists(_.nFrames == 2))
    val id3v1 = "TAG".getBytes ++ Array.fill[Byte](125)(0)
    assert(Multimodal.mp3Stats(body ++ id3v1).exists(_.nFrames == 2))
  }

  test("MP3: padded frames and MPEG2 (576-sample) streams decode") {
    val mp3 = Multimodal.encodeMp3(3, Array[Byte](1))
    // set the padding bit on frame 0: length 418, shift the rest
    val padded = mp3.clone(); padded(2) = (padded(2) | 2).toByte
    val grown = padded.take(417) ++ Array[Byte](0) ++ padded.drop(417)
    assert(Multimodal.mp3Stats(grown).exists(_.nFrames == 3))
    // one MPEG2 Layer III frame: 64 kbps idx 8, 22050 Hz idx 0 →
    // 72 * 64000 / 22050 = 208 bytes, 576 samples
    val v2 = new Array[Byte](208)
    v2(0) = 0xFF.toByte; v2(1) = 0xF3.toByte; v2(2) = 0x80.toByte
    val i = Multimodal.mp3Stats(v2).get
    assert(i.version == 2 && i.sampleRate == 22050 && i.nFrames == 1)
    assert(i.durationMs == 576L * 1000 / 22050)
  }

  test("MP3 malformed: bad sync, truncated frame, free-format, " +
    "reserved rate, mid-stream rate switch, trailing garbage") {
    val mp3 = Multimodal.encodeMp3(2, Array[Byte](1))
    assert(Multimodal.mp3Stats(Array.emptyByteArray).isEmpty)
    assert(Multimodal.mp3Stats("nosync".getBytes).isEmpty)
    assert(Multimodal.mp3Stats(mp3.dropRight(10)).isEmpty)
    val free = mp3.clone(); free(2) = 0x00.toByte // bitrate idx 0
    assert(Multimodal.mp3Stats(free).isEmpty)
    val badRate = mp3.clone(); badRate(2) = 0x9C.toByte // rate idx 3
    assert(Multimodal.mp3Stats(badRate).isEmpty)
    val switched = mp3.clone(); switched(417 + 2) = 0x94.toByte // 48 kHz
    assert(Multimodal.mp3Stats(switched).isEmpty)
    assert(Multimodal.mp3Stats(mp3 ++ Array[Byte](1, 2, 3)).isEmpty)
  }

  test("fuzz: no decoder ever throws on arbitrary bytes") {
    // the 100 TB ingest property: a poisoned payload must reject to
    // None/sentinel, never kill the task. Random blobs, random
    // truncations of VALID containers (the nastier case — prefixes
    // pass magic checks), and bit-flipped valid containers.
    val rnd = new scala.util.Random(1234L)
    val valid = Seq(
      Multimodal.encodeBmp(9, 4, Array[Byte](1, 2)),
      "P6 123 45 255 pixels".getBytes,
      Multimodal.encodeJpegHeader(31, 17, Array.fill[Byte](40)(3)),
      Multimodal.encodePng(31, 17, Array.fill[Byte](40)(3)),
      Multimodal.encodeGif(31, 17, Array.fill[Byte](300)(3)),
      Multimodal.encodeGifPixels(9, 7, Array.fill[Byte](30)(3)),
      Multimodal.encodeTiffPixels(9, 7, true, Array.fill[Byte](30)(3)),
      Multimodal.encodeTiffPixels(9, 7, false, Array.fill[Byte](30)(3)),
      Multimodal.encodeMp3(3, Array.fill[Byte](50)(3)),
      Multimodal.encodeWavPcm8(8000, Array.fill[Byte](60)(3)))
    val blobs =
      (1 to 200).map(_ => Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt.toByte)) ++
      valid.flatMap(v => (1 to 50).map(_ => v.take(rnd.nextInt(v.length + 1)))) ++
      valid.flatMap(v => (1 to 50).map { _ =>
        val m = v.clone()
        m(rnd.nextInt(m.length)) = rnd.nextInt.toByte
        m
      })
    blobs.foreach { b =>
      Multimodal.decodeBmp(b); Multimodal.decodePpm(b)
      Multimodal.decodeJpegDims(b); Multimodal.decodePngDims(b)
      Multimodal.decodeGifDims(b); Multimodal.mp3Stats(b)
      Multimodal.decodePngPixels(b); Multimodal.mp4Stats(b)
      Multimodal.decodeTiffDims(b)
      Multimodal.decodeGifPixels(b); Multimodal.decodeTiffPixels(b)
      Multimodal.lzwDecode(8, b, 64)
      Multimodal.wavStats(b)
    }
  }

  test("crafted 31-bit length fields cannot wrap the bounds checks") {
    // single bit flips (the fuzz pin) can't produce sizes near 2^31 from
    // small fixtures; these payloads plant them deliberately — each one
    // crashed the walk with IndexOutOfBounds before the Long-bound fix
    val mp4 = Multimodal.encodeMp4(4, 5, 1000, 100, Array[Byte](1, 2, 3))
    val evilMp4 = mp4.clone()
    java.nio.ByteBuffer.wrap(evilMp4).putInt(16 + 216, Int.MaxValue) // mdat
    assert(Multimodal.mp4Stats(evilMp4).isEmpty)
    val tiff = Multimodal.encodeTiff(4, 5, true, Array[Byte](1))
    val evilTiff = tiff.clone()
    java.nio.ByteBuffer.wrap(evilTiff)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(4, Int.MaxValue - 1)
    assert(Multimodal.decodeTiffDims(evilTiff).isEmpty)
    val png = Multimodal.encodePngPixels(2, 2, Array.fill[Byte](12)(7))
    val evilPng = png.clone()
    java.nio.ByteBuffer.wrap(evilPng).putInt(33, Int.MaxValue - 9) // IDAT len
    assert(Multimodal.decodePngPixels(evilPng).isEmpty)
    val wav = Multimodal.encodeWavPcm8(8000, Array[Byte](1, 2, 3, 4))
    val evilWav = wav.clone()
    java.nio.ByteBuffer.wrap(evilWav)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, Int.MaxValue - 9) // fmt chunk len
    assert(Multimodal.wavStats(evilWav).isEmpty)
  }

  test("TIFF round-trip: IFD walk under both byte orders") {
    for (le <- Seq(true, false); (w, h) <- Seq((1, 1), (640, 480), (70000, 3)))
      assert(Multimodal.decodeTiffDims(
        Multimodal.encodeTiff(w, h, le, "pix".getBytes)).contains((w, h)),
        s"${w}x$h le=$le")
    assert(Multimodal.encodeTiff(2, 3, true, Array[Byte](9)).length == 39)
  }

  test("TIFF: SHORT-typed dimension entries read left-justified in " +
    "both byte orders") {
    for (le <- Seq(true, false)) {
      val b = java.nio.ByteBuffer.allocate(38)
        .order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN
               else java.nio.ByteOrder.BIG_ENDIAN)
      b.put((if (le) "II" else "MM").getBytes)
      b.putShort(42).putInt(8).putShort(2)
      b.putShort(256).putShort(3).putInt(1).putShort(321.toShort).putShort(0)
      b.putShort(257).putShort(3).putInt(1).putShort(123.toShort).putShort(0)
      b.putInt(0)
      assert(Multimodal.decodeTiffDims(b.array()).contains((321, 123)),
        s"le=$le")
    }
  }

  test("TIFF malformed: bad mark/magic, IFD out of bounds, truncated " +
    "entry table, missing or zero dims, unknown value type") {
    val ok = Multimodal.encodeTiff(4, 5, true, Array[Byte](1))
    assert(Multimodal.decodeTiffDims(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeTiffDims("XX *....".getBytes).isEmpty)
    val badMagic = ok.clone(); badMagic(2) = 41
    assert(Multimodal.decodeTiffDims(badMagic).isEmpty)
    val farIfd = ok.clone()
    java.nio.ByteBuffer.wrap(farIfd)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(4, 10000)
    assert(Multimodal.decodeTiffDims(farIfd).isEmpty)
    val manyEntries = ok.clone()
    java.nio.ByteBuffer.wrap(manyEntries)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(8, 500.toShort)
    assert(Multimodal.decodeTiffDims(manyEntries).isEmpty)
    val zeroW = ok.clone()
    java.nio.ByteBuffer.wrap(zeroW)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(10 + 8, 0)
    assert(Multimodal.decodeTiffDims(zeroW).isEmpty)
    val badType = ok.clone()
    java.nio.ByteBuffer.wrap(badType)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(10 + 2, 5.toShort)
    assert(Multimodal.decodeTiffDims(badType).isEmpty)
  }

  test("MP4 round-trip: box walk finds mvhd timescale/duration and " +
    "tkhd 16.16 dims") {
    for ((w, h, ts, dur) <- Seq((1, 1, 1000, 0), (640, 360, 90000, 123456),
      (65535, 480, 1, 7))) {
      val mp4 = Multimodal.encodeMp4(w, h, ts, dur, "movie data".getBytes)
      val i = Multimodal.mp4Stats(mp4).get
      assert(i.width == w && i.height == h && i.timescale == ts)
      assert(i.durationMs == dur * 1000L / ts)
      assert(mp4.length == 240 + "movie data".length)
    }
  }

  test("MP4: version-1 (64-bit) mvhd/tkhd offsets are honored") {
    val b = java.nio.ByteBuffer.allocate(16 + 8 + 40 + 8 + 104)
    b.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
    b.putInt(8 + 40 + 8 + 104).put("moov".getBytes)
    b.putInt(40).put("mvhd".getBytes)
    b.putInt(0x01000000)                  // version 1
    b.putLong(0).putLong(0)               // ctime, mtime (64-bit)
    b.putInt(48000)                       // timescale at +28
    b.putLong(96000)                      // duration at +32 (64-bit)
    b.putInt(8 + 104).put("trak".getBytes)
    b.putInt(104).put("tkhd".getBytes)
    b.putInt(0x01000007)                  // version 1 + enabled
    b.putLong(0).putLong(0)               // ctime, mtime
    b.putInt(1).putInt(0)                 // track_ID, reserved
    b.putLong(96000)                      // duration (64-bit)
    b.putLong(0)                          // reserved
    b.putShort(0).putShort(0).putShort(0).putShort(0)
    for (m <- Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000))
      b.putInt(m)
    b.putInt(320 << 16).putInt(240 << 16) // width, height at +96/+100
    val i = Multimodal.mp4Stats(b.array()).get
    assert(i.timescale == 48000 && i.durationMs == 2000)
    assert(i.width == 320 && i.height == 240)
  }

  test("MP4 malformed: no ftyp, bad box framing, missing moov/tkhd, " +
    "zero timescale or dims") {
    val mp4 = Multimodal.encodeMp4(10, 20, 1000, 500, Array[Byte](1, 2))
    assert(Multimodal.mp4Stats(Array.emptyByteArray).isEmpty)
    assert(Multimodal.mp4Stats("notanmp4box".getBytes).isEmpty)
    assert(Multimodal.mp4Stats(mp4.dropRight(1)).isEmpty) // framing off
    val noMoov = mp4.clone()
    noMoov(16 + 5) = 'x'.toByte // moov → mxov
    assert(Multimodal.mp4Stats(noMoov).isEmpty)
    val zeroTs = mp4.clone()
    // mvhd box starts at 24 (ftyp 16 + moov header 8); timescale +20
    java.nio.ByteBuffer.wrap(zeroTs).putInt(24 + 20, 0)
    assert(Multimodal.mp4Stats(zeroTs).isEmpty)
    val zeroW = mp4.clone()
    // tkhd box starts at 140 (… + mvhd 108 + trak header 8); width +84
    java.nio.ByteBuffer.wrap(zeroW).putInt(140 + 84, 0)
    assert(Multimodal.mp4Stats(zeroW).isEmpty)
  }

  test("kind dispatch: real decoders for BMP/PPM, stub otherwise, " +
    "sentinel on malformed") {
    val bmp = Multimodal.encodeBmp(3, 2, Array[Byte](5))
    assert(Multimodal.decode("image/bmp", bmp) == ((3, 2)))
    assert(Multimodal.decode("image/bmp", "garbage".getBytes) == ((-1, -1)))
    val ppm = "P6 4 5 255 ".getBytes
    assert(Multimodal.decode("image/x-portable-pixmap", ppm) == ((4, 5)))
    val jpg = Multimodal.encodeJpegHeader(20, 30, Array[Byte](1))
    assert(Multimodal.decode("image/jpeg", jpg) == ((20, 30)))
    assert(Multimodal.decode("image/jpeg", "notajpeg".getBytes) == ((-1, -1)))
    val png = Multimodal.encodePng(6, 7, Array[Byte](1))
    assert(Multimodal.decode("image/png", png) == ((6, 7)))
    assert(Multimodal.decode("image/png", "notapng".getBytes) == ((-1, -1)))
    val gif = Multimodal.encodeGif(8, 9, Array[Byte](1))
    assert(Multimodal.decode("image/gif", gif) == ((8, 9)))
    assert(Multimodal.decode("image/gif", "notagif".getBytes) == ((-1, -1)))
    val blob = Array.fill[Byte](130)(7)
    assert(Multimodal.decode("application/octet-stream", blob) ==
      Multimodal.decodeStub(blob))
  }
}
