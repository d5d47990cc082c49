package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** XZ/LZMA2 pins: FULL differentials against the tukaani xz-1.10
  * implementation Spark bundles — their writer at several presets
  * (preset 0 keeps chunks simple, 6 is the default, 9 exercises big
  * dictionaries and dense rep-distance use) and under ALL FOUR check
  * types → our reader; our store-shape writer → their reader; plus
  * concatenation, stream padding, dictionary-of-presets over varied
  * data shapes, mutation/garbage fuzz and the bomb guard. */
class XzSpec extends AnyFunSuite {

  private def fixtures: Seq[Array[Byte]] = Seq(
    Array.empty[Byte],
    "a".getBytes,
    "abcbabcbabcbabcb".getBytes,
    ("the quick brown fox jumps over the lazy dog. " * 200).getBytes,
    Array.fill[Byte](10000)('x'),
    Array.tabulate[Byte](65536)(i => (i % 251).toByte),
    {
      val rnd = new scala.util.Random(42)
      Array.fill[Byte](150000)(rnd.nextInt(4).toByte)
    },
    {
      val rnd = new scala.util.Random(7)
      Array.fill[Byte](8192)(rnd.nextInt().toByte)
    },
    {
      val sb = new StringBuilder
      for (i <- 0 until 3000)
        sb.append(s"""{"id":$i,"label":"cat${i % 7}","text":"sample sample sample $i"}\n""")
      sb.toString.getBytes
    })

  private def xzCompress(data: Array[Byte], preset: Int,
      check: Int = org.tukaani.xz.XZ.CHECK_CRC64): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val opt = new org.tukaani.xz.LZMA2Options(preset)
    val z = new org.tukaani.xz.XZOutputStream(buf, opt, check)
    z.write(data); z.finish(); z.close()
    buf.toByteArray
  }

  test("differential: tukaani writer -> our reader, presets 0/3/6/9") {
    for (data <- fixtures; preset <- Seq(0, 3, 6, 9)) {
      val comp = xzCompress(data, preset)
      val got = Xz.decode(comp)
      assert(got.isDefined,
        s"rejected tukaani preset $preset, ${data.length} bytes")
      assert(got.get.sameElements(data),
        s"mis-decoded tukaani preset $preset, ${data.length} bytes")
    }
  }

  test("all four check types verify") {
    import org.tukaani.xz.XZ._
    val data = ("integrity " * 500).getBytes
    for (check <- Seq(CHECK_NONE, CHECK_CRC32, CHECK_CRC64, CHECK_SHA256)) {
      val comp = xzCompress(data, 6, check)
      assert(Xz.decode(comp).get.sameElements(data),
        s"check type $check failed")
      // flip one byte of the decoded-content region: the check (when
      // present) or structure must catch it
      val bad = comp.clone()
      bad(comp.length / 2) = (bad(comp.length / 2) ^ 1).toByte
      Xz.decode(bad) match {
        case None      => // rejected
        case Some(out) => assert(out.sameElements(data))
      }
    }
  }

  test("differential: our store writer -> tukaani reader") {
    for (data <- fixtures) {
      val enc = Xz.encodeStore(data)
      val in = new org.tukaani.xz.XZInputStream(
        new java.io.ByteArrayInputStream(enc))
      val got = in.readAllBytes()
      in.close()
      assert(got.sameElements(data),
        s"tukaani rejected our store stream (${data.length} bytes)")
      assert(Xz.decode(enc).get.sameElements(data))
    }
  }

  test("differential: OUR REAL COMPRESSOR -> tukaani reader AND " +
    "our reader, all fixture shapes (late r14)") {
    for (data <- fixtures) {
      val comp = XzEncode.encode(data)
      // tukaani — the reference implementation — must read it
      val in = new org.tukaani.xz.XZInputStream(
        new java.io.ByteArrayInputStream(comp))
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      in.close()
      assert(buf.toByteArray.sameElements(data),
        s"tukaani mis-read our frame (${data.length} bytes)")
      // and our own decoder agrees
      val ours = Xz.decode(comp)
      assert(ours.exists(_.sameElements(data)),
        s"our decoder rejected our frame (${data.length} bytes)")
    }
    // the entropy coder must actually engage: repetitive text
    // compresses far below store shape
    val text = ("the quick brown fox jumps over the lazy dog. " * 200)
      .getBytes
    val enc = XzEncode.encode(text)
    assert(enc.length < text.length / 8,
      s"lzma did not engage: ${enc.length} of ${text.length}")
    // matches spanning 64 KiB chunk boundaries: data whose only
    // repeats sit > 64 KiB apart
    val rnd = new scala.util.Random(99)
    val page = Array.fill(70000)(rnd.nextInt().toByte)
    val spanning = page ++ page // second half matches 70000 back
    val encSpan = XzEncode.encode(spanning)
    assert(encSpan.length < spanning.length * 2 / 3)
    val back = Xz.decode(encSpan)
    assert(back.exists(_.sameElements(spanning)))
    // >16 chunks of mode-0 continuation (probabilities persisting
    // across 64 KiB chunk boundaries): a 2 MiB structured corpus
    val big = {
      val b = new StringBuilder
      var i = 0
      while (b.length < (2 << 20)) {
        b.append(s"""{"row":$i,"val":"${i * 7919 % 1000}"}\n""")
        i += 1
      }
      b.toString.getBytes
    }
    val encBig = XzEncode.encode(big)
    assert(encBig.length < big.length / 4)
    val inBig = new org.tukaani.xz.XZInputStream(
      new java.io.ByteArrayInputStream(encBig))
    val bufBig = new java.io.ByteArrayOutputStream()
    var bn = inBig.read(tmpBuf)
    while (bn > 0) { bufBig.write(tmpBuf, 0, bn); bn = inBig.read(tmpBuf) }
    inBig.close()
    assert(bufBig.toByteArray.sameElements(big))
    assert(Xz.decode(encBig).exists(_.sameElements(big)))
    // incompressible data falls back to uncompressed chunks and a
    // compressed chunk after a fallback carries the state reset
    val noise = Array.fill(200000)(rnd.nextInt().toByte)
    val mixed = noise.take(100000) ++ text ++ noise.drop(100000)
    val encMix = XzEncode.encode(mixed)
    val inMix = new org.tukaani.xz.XZInputStream(
      new java.io.ByteArrayInputStream(encMix))
    val bufMix = new java.io.ByteArrayOutputStream()
    var m = inMix.read(tmpBuf)
    while (m > 0) { bufMix.write(tmpBuf, 0, m); m = inMix.read(tmpBuf) }
    inMix.close()
    assert(bufMix.toByteArray.sameElements(mixed))
    assert(Xz.decode(encMix).exists(_.sameElements(mixed)))
  }

  private val tmpBuf = new Array[Byte](8192)

  test("differential: tiny dictionary forces mid-stream LZMA2 resets") {
    // a 64 KiB dict over 150 KB of repetitive data makes tukaani cut
    // multiple LZMA2 chunks with dict/state resets — the chunk-layer
    // paths a single-chunk stream never visits
    val rnd = new scala.util.Random(9)
    val data = Array.fill[Byte](150000)(('a' + rnd.nextInt(3)).toByte)
    val buf = new java.io.ByteArrayOutputStream()
    val opt = new org.tukaani.xz.LZMA2Options(3)
    opt.setDictSize(1 << 16)
    val z = new org.tukaani.xz.XZOutputStream(buf, opt)
    z.write(data); z.finish(); z.close()
    val got = Xz.decode(buf.toByteArray)
    assert(got.isDefined && got.get.sameElements(data))
  }

  test("differential: legacy .lzma (tukaani LZMAOutputStream) decodes") {
    for (data <- fixtures if data.nonEmpty) {
      // known-size header (no EOS marker)
      val b1 = new java.io.ByteArrayOutputStream()
      val z1 = new org.tukaani.xz.LZMAOutputStream(b1,
        new org.tukaani.xz.LZMA2Options(4), data.length.toLong)
      z1.write(data); z1.close()
      val got1 = Xz.decodeAlone(b1.toByteArray)
      assert(got1.isDefined && got1.get.sameElements(data),
        s"known-size .lzma failed (${data.length} bytes)")
      // unknown-size header (EOS-terminated)
      val b2 = new java.io.ByteArrayOutputStream()
      val z2 = new org.tukaani.xz.LZMAOutputStream(b2,
        new org.tukaani.xz.LZMA2Options(4), -1L)
      z2.write(data); z2.close()
      val got2 = Xz.decodeAlone(b2.toByteArray)
      assert(got2.isDefined && got2.get.sameElements(data),
        s"EOS-terminated .lzma failed (${data.length} bytes)")
    }
    // garbage fuzz on the alone form
    val rnd = new scala.util.Random(0x17a)
    for (_ <- 0 until 2000) {
      val junk = Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      Xz.decodeAlone(junk)
    }
  }

  test("concatenated streams with 4-byte stream padding") {
    val a = xzCompress("first ".getBytes, 6)
    val b = Xz.encodeStore("second".getBytes)
    val pad = Array.fill[Byte](8)(0)
    val got = Xz.decode(a ++ pad ++ b)
    assert(got.isDefined && got.get.sameElements("first second".getBytes))
    // misaligned padding rejects
    assert(Xz.decode(a ++ Array.fill[Byte](3)(0) ++ b).isEmpty)
    // trailing garbage rejects
    assert(Xz.decode(a :+ 0x77.toByte).isEmpty)
  }

  test("mutation fuzz: single-byte corruptions reject or decode exactly") {
    val data = ("banana banana banana! " * 50).getBytes
    val comp = xzCompress(data, 6) // CRC64 check
    for (i <- comp.indices; delta <- Seq(1, 0x80)) {
      val bad = comp.clone()
      bad(i) = (bad(i) + delta).toByte
      Xz.decode(bad) match {
        case None      => // rejected
        case Some(out) => assert(out.sameElements(data),
          s"corruption at byte $i survived the CRC64 check")
      }
    }
  }

  test("garbage fuzz never throws") {
    val rnd = new scala.util.Random(0x997)
    for (_ <- 0 until 3000) {
      val junk = Array.fill(rnd.nextInt(96))(rnd.nextInt().toByte)
      Xz.decode(junk)
    }
    val magic = Array[Byte](0xfd.toByte, '7', 'z', 'X', 'Z', 0)
    for (_ <- 0 until 1000) {
      val junk = magic ++ Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      Xz.decode(junk)
    }
  }

  test("bomb guard and sniff") {
    val big = Array.fill[Byte](200000)('z')
    val comp = xzCompress(big, 6)
    assert(Xz.decode(comp, maxOut = 1000).isEmpty)
    assert(Xz.decode(comp, maxOut = 200000).isDefined)
    assert(Xz.isXz(comp) && Xz.isXz(Xz.encodeStore("x".getBytes)))
    assert(!Xz.isXz("PK".getBytes))
  }

  test("our .lzma-alone writer: tukaani LZMAInputStream AND " +
    "decodeAlone read it (late r14)") {
    for (data <- fixtures) {
      val enc = XzEncode.encodeAlone(data)
      val in = new org.tukaani.xz.LZMAInputStream(
        new java.io.ByteArrayInputStream(enc))
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      in.close()
      assert(buf.toByteArray.sameElements(data),
        s"tukaani mis-read our .lzma (${data.length} bytes)")
      assert(Xz.decodeAlone(enc).exists(_.sameElements(data)),
        s"decodeAlone rejected our .lzma (${data.length} bytes)")
    }
  }

  test(".lzma with trailing garbage rejects (whole-input rule)") {
    // the repo-wide trailing-bytes discipline (Qoi, Msgpack, bzip2):
    // a stream that does not consume the whole file is malformed
    val data = ("the quick brown fox " * 40).getBytes
    for (size <- Seq(data.length.toLong, -1L)) { // known + EOS forms
      val b = new java.io.ByteArrayOutputStream()
      val z = new org.tukaani.xz.LZMAOutputStream(b,
        new org.tukaani.xz.LZMA2Options(4), size)
      z.write(data); z.close()
      val good = b.toByteArray
      assert(Xz.decodeAlone(good).exists(_.sameElements(data)))
      assert(Xz.decodeAlone(good ++ Array[Byte](0x42)).isEmpty,
        s"trailing garbage accepted (size=$size)")
      assert(Xz.decodeAlone(good ++ "junk".getBytes).isEmpty)
    }
  }
}
