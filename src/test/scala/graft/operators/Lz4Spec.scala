package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** LZ4 pins: xxh32 against the spec's empty-input vector AND
  * differentially against the lz4-java implementation Spark bundles,
  * block + frame round trips over every payload shape, FULL
  * cross-implementation differentials in both directions (our block
  * into lz4-java's decompressor, lz4-java's block into ours; same at
  * frame level through LZ4FrameInput/OutputStream), and mutation
  * fuzz — a corrupted frame decodes to None or byte-identically,
  * never to silent garbage, and never throws. */
class Lz4Spec extends AnyFunSuite {

  private def rng = new java.util.Random(0x85ebca77L)

  /** Payload shapes a shard corpus actually exhibits. */
  private def corpora(r: java.util.Random): Seq[Array[Byte]] = Seq(
    Array.emptyByteArray,
    Array[Byte](7),
    "abcabcabcabcabcabcabcabcabc".getBytes("US-ASCII"),
    Array.fill[Byte](100000)(42),
    Array.tabulate[Byte](70000)(i => (i % 251).toByte), // crosses 64 KiB
    { val b = new Array[Byte](3000); r.nextBytes(b); b }, // incompressible
    { val b = new Array[Byte](50000); r.nextBytes(b) // mixed runs
      for (i <- 10000 until 40000) b(i) = (i / 100 % 7).toByte; b },
    ("the quick brown fox " * 4000).getBytes("US-ASCII"))

  test("xxh32: spec vector and differential vs lz4-java") {
    assert(Lz4.xxh32(Array.emptyByteArray, 0, 0, 0) == 0x02CC5D05)
    val jxx = net.jpountz.xxhash.XXHashFactory.fastestJavaInstance().hash32()
    val r = rng
    for (_ <- 1 to 300) {
      val b = new Array[Byte](r.nextInt(200))
      r.nextBytes(b)
      val seed = r.nextInt()
      assert(Lz4.xxh32(b, 0, b.length, seed) ==
        jxx.hash(b, 0, b.length, seed), s"len=${b.length}")
    }
    val big = new Array[Byte](100000)
    r.nextBytes(big)
    assert(Lz4.xxh32(big, 0, big.length, 0) ==
      jxx.hash(big, 0, big.length, 0))
  }

  test("block: round trips through our own decoder") {
    val r = rng
    for (src <- corpora(r)) {
      val comp = Lz4.compressBlock(src)
      val dst = new Array[Byte](src.length)
      assert(Lz4.decompressBlock(comp, 0, comp.length, dst) == src.length)
      assert(dst.toSeq == src.toSeq)
    }
  }

  test("block differential: ours decodes lz4-java, lz4-java decodes ours") {
    val f = net.jpountz.lz4.LZ4Factory.fastestJavaInstance()
    val r = rng
    for (src <- corpora(r)) {
      // lz4-java compresses → we decompress
      val theirs = f.fastCompressor().compress(src)
      val dst = new Array[Byte](src.length)
      assert(Lz4.decompressBlock(theirs, 0, theirs.length, dst)
        == src.length, s"n=${src.length}")
      assert(dst.toSeq == src.toSeq)
      // we compress → lz4-java safe-decompresses
      val ours = Lz4.compressBlock(src)
      val back = f.safeDecompressor().decompress(ours, src.length)
      assert(back.toSeq == src.toSeq, s"n=${src.length}")
    }
  }

  test("frame: round trips, content size + checksum honoured") {
    val r = rng
    for (src <- corpora(r)) {
      val fr = Lz4.frameCompress(src)
      assert(Lz4.isLz4(fr))
      val got = Lz4.frameDecompress(fr)
      assert(got.isDefined)
      assert(got.get.toSeq == src.toSeq)
    }
  }

  test("frame differential: lz4-java streams read ours; we read theirs") {
    val r = rng
    for (src <- corpora(r)) {
      // ours → LZ4FrameInputStream
      val in = new net.jpountz.lz4.LZ4FrameInputStream(
        new java.io.ByteArrayInputStream(Lz4.frameCompress(src)))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      assert(out.toByteArray.toSeq == src.toSeq, s"n=${src.length}")
      // LZ4FrameOutputStream → ours
      val bos = new java.io.ByteArrayOutputStream()
      val fos = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
      fos.write(src); fos.close()
      val got = Lz4.frameDecompress(bos.toByteArray)
      assert(got.isDefined, s"n=${src.length}")
      assert(got.get.toSeq == src.toSeq)
    }
  }

  test("frame mutation fuzz: corruption → None or identical, no throw") {
    val r = rng
    val src = ("lorem ipsum dolor sit amet " * 300).getBytes("US-ASCII")
    val fr = Lz4.frameCompress(src)
    var rejected = 0
    for (_ <- 1 to 400) {
      val m = fr.clone()
      m(r.nextInt(m.length)) =
        (m(r.nextInt(m.length)) ^ (1 << r.nextInt(8))).toByte
      Lz4.frameDecompress(m) match {
        case None => rejected += 1
        case Some(got) => assert(got.toSeq == src.toSeq)
      }
    }
    assert(rejected > 300, s"only $rejected/400 rejected") // checksums bite
  }

  test("frame garbage fuzz: arbitrary bytes never throw") {
    val r = rng
    for (_ <- 1 to 400) {
      val b = new Array[Byte](r.nextInt(300))
      r.nextBytes(b)
      Lz4.frameDecompress(b) // must simply not throw
      if (b.length >= 4) { // stamp the magic so the walk goes deeper
        b(0) = 0x04; b(1) = 0x22; b(2) = 0x4d.toByte; b(3) = 0x18
        Lz4.frameDecompress(b)
      }
    }
  }

  test("malformed blocks reject: zero offset, over-window, truncation") {
    val dst = new Array[Byte](100)
    // token wants a match, offset 0
    assert(Lz4.decompressBlock(
      Array[Byte](0x04, 'a', 0, 0), 0, 4, dst) == -1)
    // offset beyond what's decoded so far
    assert(Lz4.decompressBlock(
      Array[Byte](0x14, 'a', 9, 0), 0, 4, dst) == -1)
    // literal run past the input end
    assert(Lz4.decompressBlock(Array[Byte](0x50, 'a'), 0, 2, dst) == -1)
    // output larger than dst
    val tiny = new Array[Byte](2)
    assert(Lz4.decompressBlock(
      Array[Byte](0x30, 'a', 'b', 'c'), 0, 4, tiny) == -1)
  }
}
