package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Snappy pins: raw-format round trips over every payload shape,
  * FULL cross-implementation differentials against the snappy-java
  * implementation Spark bundles (both directions, raw and framed —
  * the same natives Spark's own parquet reads run through), framing
  * CRC enforcement via mutation fuzz, and garbage fuzz (parse never
  * throws, never invents). */
class SnappyCodecSpec extends AnyFunSuite {

  private def rng = new java.util.Random(0x27d4eb2fL)

  private def corpora(r: java.util.Random): Seq[Array[Byte]] = Seq(
    Array.emptyByteArray,
    Array[Byte](7),
    "abcabcabcabcabcabcabcabcabc".getBytes("US-ASCII"),
    Array.fill[Byte](100000)(42),
    Array.tabulate[Byte](70000)(i => (i % 251).toByte), // crosses 64 KiB
    { val b = new Array[Byte](3000); r.nextBytes(b); b }, // incompressible
    { val b = new Array[Byte](50000); r.nextBytes(b)
      for (i <- 10000 until 40000) b(i) = (i / 100 % 7).toByte; b },
    ("the quick brown fox " * 4000).getBytes("US-ASCII"))

  test("raw: round trips through our own decoder") {
    val r = rng
    for (src <- corpora(r)) {
      val got = SnappyCodec.decompress(SnappyCodec.compress(src))
      assert(got.isDefined, s"n=${src.length}")
      assert(got.get.toSeq == src.toSeq)
    }
  }

  test("raw differential: ours decodes snappy-java, snappy-java ours") {
    val r = rng
    for (src <- corpora(r)) {
      val theirs = org.xerial.snappy.Snappy.compress(src)
      val got = SnappyCodec.decompress(theirs)
      assert(got.isDefined, s"n=${src.length}")
      assert(got.get.toSeq == src.toSeq)
      val ours = SnappyCodec.compress(src)
      val back = org.xerial.snappy.Snappy.uncompress(ours)
      assert(back.toSeq == src.toSeq, s"n=${src.length}")
    }
  }

  test("framed: round trips, chunking at 64 KiB") {
    val r = rng
    for (src <- corpora(r)) {
      val fr = SnappyCodec.frameCompress(src)
      assert(SnappyCodec.isFramed(fr))
      val got = SnappyCodec.frameDecompress(fr)
      assert(got.isDefined, s"n=${src.length}")
      assert(got.get.toSeq == src.toSeq)
    }
  }

  test("framed differential: snappy-java streams read ours; we theirs") {
    val r = rng
    for (src <- corpora(r)) {
      // ours → SnappyFramedInputStream
      val in = new org.xerial.snappy.SnappyFramedInputStream(
        new java.io.ByteArrayInputStream(SnappyCodec.frameCompress(src)))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      assert(out.toByteArray.toSeq == src.toSeq, s"n=${src.length}")
      // SnappyFramedOutputStream → ours
      val bos = new java.io.ByteArrayOutputStream()
      val fos = new org.xerial.snappy.SnappyFramedOutputStream(bos)
      fos.write(src); fos.close()
      val got = SnappyCodec.frameDecompress(bos.toByteArray)
      assert(got.isDefined, s"n=${src.length}")
      assert(got.get.toSeq == src.toSeq)
    }
  }

  test("frame mutation fuzz: corruption → None or identical, no throw") {
    val r = rng
    val src = ("lorem ipsum dolor sit amet " * 300).getBytes("US-ASCII")
    val fr = SnappyCodec.frameCompress(src)
    var rejected = 0
    for (_ <- 1 to 400) {
      val m = fr.clone()
      m(r.nextInt(m.length)) =
        (m(r.nextInt(m.length)) ^ (1 << r.nextInt(8))).toByte
      SnappyCodec.frameDecompress(m) match {
        case None => rejected += 1
        case Some(got) => assert(got.toSeq == src.toSeq)
      }
    }
    assert(rejected > 300, s"only $rejected/400 rejected") // CRC-32C bites
  }

  test("garbage fuzz: arbitrary bytes never throw (raw and framed)") {
    val r = rng
    for (_ <- 1 to 400) {
      val b = new Array[Byte](r.nextInt(300))
      r.nextBytes(b)
      SnappyCodec.decompress(b)
      SnappyCodec.frameDecompress(b)
      if (b.length >= 10) { // stamp the stream id so the walk goes deeper
        val id = Array[Byte](0xff.toByte, 6, 0, 0, 's', 'N', 'a', 'P', 'p', 'Y')
        System.arraycopy(id, 0, b, 0, 10)
        SnappyCodec.frameDecompress(b)
      }
    }
  }

  test("framed: skippable chunks skip, unskippable reject, padding ok") {
    val fr = SnappyCodec.frameCompress("hello snappy".getBytes("US-ASCII"))
    // append a skippable padding chunk (0xfe) — still decodes
    val pad = fr ++ Array[Byte](0xfe.toByte, 3, 0, 0, 1, 2, 3)
    assert(SnappyCodec.frameDecompress(pad).map(new String(_, "US-ASCII"))
      .contains("hello snappy"))
    // an unskippable reserved chunk (0x02) rejects the stream
    val bad = fr ++ Array[Byte](0x02, 1, 0, 0, 9)
    assert(SnappyCodec.frameDecompress(bad).isEmpty)
  }

  test("raw: bomb preamble rejects without allocating") {
    // varint says 1 GiB — over the 2^28 cap → None immediately
    val bomb = Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte,
      0x80.toByte, 0x04, 0x00)
    assert(SnappyCodec.decompress(bomb).isEmpty)
  }
}
