package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Zstandard pins: FULL differentials against TWO independent
  * bundled implementations — zstd-jni (the C library Spark loads for
  * parquet/shuffle codecs) and aircompressor (airlift's pure-Java
  * port) — across compression levels (low levels exercise the RFC's
  * predefined FSE distributions, high levels the FSE-compressed
  * tables and 4-stream Huffman), our store-mode writer read by both
  * of them (which also differentials our xxHash64 through their
  * checksum verification), skippable frames, concatenation,
  * dictionary rejection, checksum-mismatch rejection, and
  * mutation + garbage fuzz. */
class ZstdSpec extends AnyFunSuite {

  private def fixtures: Seq[Array[Byte]] = Seq(
    Array.empty[Byte],
    "a".getBytes,
    "abcbabcbabcbabcb".getBytes, // short repeats
    ("the quick brown fox jumps over the lazy dog. " * 200).getBytes,
    Array.fill[Byte](10000)('x'),
    Array.tabulate[Byte](65536)(i => (i % 251).toByte),
    {
      val rnd = new scala.util.Random(42)
      Array.fill[Byte](150000)(rnd.nextInt(4).toByte) // multi-block
    },
    {
      val rnd = new scala.util.Random(7)
      Array.fill[Byte](8192)(rnd.nextInt().toByte) // incompressible
    },
    {
      // structured: repeated records with drifting fields — the
      // jsonl.zst shape; long matches at many distances
      val sb = new StringBuilder
      for (i <- 0 until 3000)
        sb.append(s"""{"id":$i,"label":"cat${i % 7}","text":"sample sample sample $i"}\n""")
      sb.toString.getBytes
    })

  test("differential: zstd-jni writer -> our reader, levels 1/3/9/19") {
    for (data <- fixtures; level <- Seq(1, 3, 9, 19)) {
      val comp = com.github.luben.zstd.Zstd.compress(data, level)
      val got = Zstd.decode(comp)
      assert(got.isDefined,
        s"rejected zstd-jni level $level, ${data.length} bytes")
      assert(got.get.sameElements(data),
        s"mis-decoded zstd-jni level $level, ${data.length} bytes")
    }
  }

  test("differential: zstd-jni with checksum and long window") {
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    ctx.setLevel(5)
    ctx.setChecksum(true)
    for (data <- fixtures) {
      val comp = ctx.compress(data)
      val got = Zstd.decode(comp)
      assert(got.isDefined && got.get.sameElements(data))
      // flip a content byte: the xxh64 check must catch it (find a
      // mutable byte inside the frame body, past the 6-byte header)
      if (data.length >= 32) {
        val bad = comp.clone()
        bad(comp.length / 2) = (bad(comp.length / 2) ^ 1).toByte
        Zstd.decode(bad) match {
          case None      => // rejected — checksum or structure caught it
          case Some(out) => assert(out.sameElements(data),
            "corruption survived BOTH structure and checksum")
        }
      }
    }
  }

  test("differential: aircompressor writer -> our reader") {
    val c = new io.airlift.compress.zstd.ZstdCompressor()
    for (data <- fixtures) {
      val buf = new Array[Byte](c.maxCompressedLength(data.length))
      val n = c.compress(data, 0, data.length, buf, 0, buf.length)
      val got = Zstd.decode(java.util.Arrays.copyOf(buf, n))
      assert(got.isDefined && got.get.sameElements(data),
        s"aircompressor stream mis-handled (${data.length} bytes)")
    }
  }

  test("differential: our store-mode writer -> both their readers") {
    for (data <- fixtures; checksum <- Seq(true, false)) {
      val enc = Zstd.encodeStore(data, withChecksum = checksum)
      // zstd-jni (verifies our frame header + checksum arithmetic)
      val theirs = com.github.luben.zstd.Zstd.decompress(
        enc, math.max(data.length, 1))
      assert(theirs.sameElements(data),
        s"zstd-jni rejected our store frame (${data.length} bytes)")
      // aircompressor
      if (data.nonEmpty) {
        val d = new io.airlift.compress.zstd.ZstdDecompressor()
        val out = new Array[Byte](data.length)
        val n = d.decompress(enc, 0, enc.length, out, 0, out.length)
        assert(n == data.length && out.sameElements(data),
          "aircompressor rejected our store frame")
      }
      // and our own round trip
      assert(Zstd.decode(enc).get.sameElements(data))
    }
  }

  test("our COMPRESSING writer -> zstd-jni, aircompressor and our " +
    "own reader; entropy coding actually engages (r14)") {
    val rnd = new java.util.Random(7)
    def roundtrip(data: Array[Byte], mustShrink: Boolean): Unit = {
      val enc = ZstdEncode.encode(data)
      if (mustShrink)
        assert(enc.length < Zstd.encodeStore(data).length,
          s"no compression on ${data.length} bytes")
      // ours
      assert(Zstd.decode(enc).exists(_.sameElements(data)),
        s"our reader failed on ${data.length} bytes")
      // the C library
      val jni = com.github.luben.zstd.Zstd.decompress(enc,
        math.max(data.length, 1))
      assert(jni.sameElements(data), "zstd-jni mismatch")
      // airlift's independent Java port
      val dec = new io.airlift.compress.zstd.ZstdDecompressor()
      val out = new Array[Byte](data.length + 8)
      val n = dec.decompress(enc, 0, enc.length, out, 0, out.length)
      assert(n == data.length &&
        java.util.Arrays.equals(out, 0, n, data, 0, n),
        "aircompressor mismatch")
    }
    // repetitive text: LZ matches + Huffman literals (multi-block)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val text = {
      val sb = new StringBuilder
      while (sb.length < 400000)
        { sb ++= words(rnd.nextInt(5)); sb += ' ' }
      sb.toString.getBytes
    }
    roundtrip(text, mustShrink = true)
    // skewed no-match literals ≤ 1023: the 1-STREAM Huffman layout
    val skew1 = Array.tabulate(700)(_ =>
      ("eeeeeeeettaaoinshr" (rnd.nextInt(18))).toByte)
    roundtrip(skew1, mustShrink = true)
    // skewed no-match literals > 1023: the 4-STREAM jump-table form
    val skew4 = Array.tabulate(60000)(_ =>
      ("eeeeeeeeeeeettttaaaoinshrdlu" (rnd.nextInt(28))).toByte)
    roundtrip(skew4, mustShrink = true)
    // super-exponential frequencies force the depth-11 limit repair
    val deep = {
      val b = new java.io.ByteArrayOutputStream()
      (0 until 20).foreach { s =>
        val cnt = math.max(1, (math.pow(1.9, s) / 1.9).toInt)
        (0 until cnt).foreach(_ => b.write('a' + s))
      }
      val a = b.toByteArray; shuffle(a, rnd); a
    }
    roundtrip(deep, mustShrink = false)
    // bytes above 128: direct Huffman weights can't list them —
    // raw-literal fallback must stay correct
    val high = Array.tabulate(5000)(i => (170 + i % 50).toByte)
    roundtrip(high, mustShrink = true) // LZ still compresses it
    // incompressible: raw-block fallback
    val noise = new Array[Byte](30000); rnd.nextBytes(noise)
    roundtrip(noise, mustShrink = false)
    // structured fuzz: random mixes of runs, text and noise
    (0 until 25).foreach { _ =>
      val b = new java.io.ByteArrayOutputStream()
      (0 until 1 + rnd.nextInt(6)).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 =>
            val c = rnd.nextInt(256).toByte
            (0 until rnd.nextInt(3000)).foreach(_ => b.write(c))
          case 1 =>
            (0 until rnd.nextInt(3000)).foreach(_ =>
              b.write(words(rnd.nextInt(5)).getBytes))
          case _ =>
            val x = new Array[Byte](rnd.nextInt(3000))
            rnd.nextBytes(x); b.write(x)
        }
      }
      roundtrip(b.toByteArray, mustShrink = false)
    }
    // size boundaries around block/format splits
    Seq(0, 1, 31, 32, 63, 64, 1023, 1024, 4095, 4096,
      (1 << 17) - 1, 1 << 17, (1 << 17) + 1).foreach { sz =>
      val d = Array.tabulate(sz)(i => ("abcdef" (i % 6)).toByte)
      roundtrip(d, mustShrink = false)
    }
  }

  private def shuffle(a: Array[Byte], rnd: java.util.Random): Unit = {
    var i = a.length - 1
    while (i > 0) {
      val j = rnd.nextInt(i + 1)
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
  }

  test("skippable frames and concatenation") {
    val a = com.github.luben.zstd.Zstd.compress("first ".getBytes, 3)
    val b = Zstd.encodeStore("second".getBytes)
    val skip = Array[Byte](0x52, 0x2a, 0x4d, 0x18, 4, 0, 0, 0, 9, 9, 9, 9)
    val got = Zstd.decode(skip ++ a ++ skip ++ b ++ skip)
    assert(got.isDefined && got.get.sameElements("first second".getBytes))
    // a lone skippable frame has no content frame: reject
    assert(Zstd.decode(skip).isEmpty)
    // trailing garbage rejects
    assert(Zstd.decode(a :+ 0x00.toByte).isEmpty)
  }

  test("differential: trained-dictionary frames decode with the dict") {
    val trainer = new com.github.luben.zstd.ZstdDictTrainer(1 << 16, 1 << 12)
    for (i <- 0 until 64)
      trainer.addSample(s"sample text number $i with shared structure"
        .getBytes)
    val dict = trainer.trainSamples()
    assert(Zstd.parseDict(dict).isDefined, "trained dict must parse")
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    ctx.setLevel(3)
    ctx.loadDict(dict)
    for (i <- Seq(99, 7, 1000)) {
      val data = (s"sample text number $i with shared structure " +
        "and a longer tail so matches reach into the dictionary " * 3)
        .getBytes
      val comp = ctx.compress(data)
      // without the dictionary: reject (the frame names a dict id)
      assert(Zstd.decode(comp).isEmpty,
        "dictionary frame must reject without the dictionary")
      // with it: decode exactly
      val got = Zstd.decodeWithDict(comp, dict)
      assert(got.isDefined && got.get.sameElements(data),
        s"dictionary decode failed for sample $i")
    }
    // dictionary mutation fuzz: a corrupted dict must never make
    // decodeWithDict throw (reject or decode-exact are both fine —
    // content-region corruption changes history bytes, which the
    // frame checksum then catches when present)
    val rnd = new scala.util.Random(0xd1c7)
    val data = "sample text number 5 with shared structure".getBytes
    val comp = ctx.compress(data)
    for (_ <- 0 until 800) {
      val bad = dict.clone()
      bad(rnd.nextInt(bad.length)) = rnd.nextInt().toByte
      Zstd.decodeWithDict(comp, bad) // must not throw
    }
  }

  test("raw-content dictionaries work as history") {
    val dictContent =
      "the quick brown fox jumps over the lazy dog repeatedly".getBytes
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    ctx.setLevel(19)
    ctx.loadDict(dictContent) // zstd-jni auto-detects raw content
    val data = ("the quick brown fox jumps over the lazy dog " * 4)
      .getBytes
    val comp = ctx.compress(data)
    val got = Zstd.decodeWithDict(comp, dictContent)
    assert(got.isDefined && got.get.sameElements(data))
  }

  test("encodeWithDict: raw-content dict frames decode via " +
    "zstd-jni AND our decoder, and dict matches engage (late r14)") {
    val rnd = new scala.util.Random(71)
    val dict = new Array[Byte](4096)
    rnd.nextBytes(dict)
    for (len <- Seq(32, 500, 5000)) {
      // shards interleaving dict slices with fresh noise
      val data = new Array[Byte](len)
      var i = 0
      while (i < len) {
        val take = math.min(len - i, 16 + rnd.nextInt(48))
        if (rnd.nextBoolean() && take < dict.length) {
          val src = rnd.nextInt(dict.length - take)
          System.arraycopy(dict, src, data, i, take)
        } else (0 until take).foreach(j =>
          data(i + j) = rnd.nextInt().toByte)
        i += take
      }
      val enc = ZstdEncode.encodeWithDict(data, dict)
      val ctx = new com.github.luben.zstd.ZstdDecompressCtx()
      ctx.loadDict(dict)
      assert(ctx.decompress(enc, len).sameElements(data),
        s"zstd-jni at len $len")
      val ours = Zstd.decodeWithDict(enc, dict)
      assert(ours.exists(_.sameElements(data)), s"ours at len $len")
    }
    // dict matches must actually engage: a pure-dict-slice shard of
    // incompressible bytes can only shrink via offsets into the dict
    val slice = java.util.Arrays.copyOfRange(dict, 100, 3100)
    val encS = ZstdEncode.encodeWithDict(slice, dict)
    assert(encS.length < slice.length / 4,
      s"dict history did not engage: ${encS.length} of ${slice.length}")
    assert(Zstd.decodeWithDict(encS, dict)
      .exists(_.sameElements(slice)))
    // without the dict our decoder must refuse (the frame's offsets
    // reach into history that doesn't exist), never invent bytes
    assert(Zstd.decode(encS).isEmpty)
    // empty dict degrades to the plain encoder
    val plain = ZstdEncode.encodeWithDict(slice, Array.emptyByteArray)
    assert(Zstd.decode(plain).exists(_.sameElements(slice)))
  }

  test("mutation fuzz: single-byte corruptions reject or decode exactly") {
    val data = ("banana banana banana! " * 50).getBytes
    val comp = com.github.luben.zstd.Zstd.compress(data, 3)
    for (i <- comp.indices; delta <- Seq(1, 0x80)) {
      val bad = comp.clone()
      bad(i) = (bad(i) + delta).toByte
      Zstd.decode(bad) match {
        case None      => // rejected: good
        case Some(out) =>
          // no checksum in this frame — a surviving mutation must at
          // least not crash; content may differ ONLY if the flipped
          // byte was inside entropy payloads that still parse. What
          // we pin: dims of the contract — never an exception, and
          // never output beyond the declared content size
          assert(out.length == data.length,
            s"mutation at $i changed the declared content size")
      }
    }
  }

  test("garbage fuzz never throws") {
    val rnd = new scala.util.Random(0x25d)
    for (_ <- 0 until 3000) {
      val junk = Array.fill(rnd.nextInt(96))(rnd.nextInt().toByte)
      Zstd.decode(junk)
    }
    for (_ <- 0 until 1000) {
      val junk = Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte) ++
        Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      Zstd.decode(junk)
    }
  }

  test("bomb guard: output cap enforced") {
    val big = Array.fill[Byte](200000)('z')
    val comp = com.github.luben.zstd.Zstd.compress(big, 3)
    assert(Zstd.decode(comp, maxOut = 1000).isEmpty)
    assert(Zstd.decode(comp, maxOut = 200000).isDefined)
  }

  test("xxh64 agrees with zstd-jni through checksum round trips") {
    // zstd-jni VERIFIES checksums on decompress: our store frames
    // with checksums already passed above. Pin a few known shapes
    // through our own decode too (reject on flipped checksum byte).
    val enc = Zstd.encodeStore("checksum pinned payload".getBytes)
    val bad = enc.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x40).toByte
    assert(Zstd.decode(bad).isEmpty)
  }

  test("sniff") {
    assert(Zstd.isZstd(Zstd.encodeStore("x".getBytes)))
    assert(Zstd.isZstd(com.github.luben.zstd.Zstd.compress("x".getBytes, 1)))
    assert(!Zstd.isZstd("PK".getBytes))
  }

  test("differential: 9 MiB at level 19 — long-range window matches") {
    // r11 verdict #7: exercise window-wrap match copies well beyond
    // the small fixtures. Level 19 on a multi-MiB input uses a large
    // window (8 MiB class) and emits matches whose offsets reach
    // megabytes back; the payload repeats a 1 MiB pseudo-random base
    // with per-copy point mutations so long-range matches are the
    // dominant encoding.
    val rnd = new scala.util.Random(0xd1f5)
    val base = Array.fill[Byte](1 << 20)(rnd.nextInt().toByte)
    val out = new java.io.ByteArrayOutputStream(9 << 20)
    for (copy <- 0 until 9) {
      val blk = base.clone()
      var i = 0
      while (i < 64) { blk(rnd.nextInt(blk.length)) = rnd.nextInt().toByte
        i += 1 }
      out.write(blk, 0, if (copy == 8) blk.length / 3 else blk.length)
    }
    val data = out.toByteArray
    assert(data.length > (8 << 20))
    val comp = com.github.luben.zstd.Zstd.compress(data, 19)
    assert(comp.length < data.length / 4) // long matches actually fired
    val got = Zstd.decode(comp)
    assert(got.isDefined, "level-19 large-window frame rejected")
    assert(java.util.Arrays.equals(got.get, data))
  }
}
