package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** bzip2 pins: exact round trips across data shapes (text, runs,
  * periodic blocks, single-byte, empty, binary, multi-block),
  * concatenated-stream decode, FULL differentials against the
  * commons-compress 1.28 implementation Spark bundles (their writer →
  * our reader; our writer → their reader), the randomised-bit and
  * trailing-garbage rejections, mutation fuzz over every byte of a
  * real stream, and garbage fuzz (never throws, never invents). */
class Bzip2Spec extends AnyFunSuite {

  private def rt(data: Array[Byte], level: Int = 1): Unit = {
    val enc = Bzip2.encode(data, level)
    val dec = Bzip2.decode(enc)
    assert(dec.isDefined, s"round trip failed to decode (${data.length} bytes)")
    assert(dec.get.sameElements(data))
  }

  private def fixtures: Seq[Array[Byte]] = Seq(
    Array.empty[Byte],
    "a".getBytes,
    "abracadabra".getBytes,
    ("the quick brown fox jumps over the lazy dog. " * 40).getBytes,
    Array.fill[Byte](1000)('x'), // long RLE1 runs
    Array.tabulate[Byte](4096)(i => (i % 251).toByte),
    Array.tabulate[Byte](300)(i => if (i % 2 == 0) 'a' else 'b'), // periodic
    {
      val rnd = new scala.util.Random(42)
      Array.fill[Byte](20000)(rnd.nextInt(8).toByte) // low-entropy binary
    },
    {
      val rnd = new scala.util.Random(7)
      Array.fill[Byte](5000)(rnd.nextInt().toByte) // incompressible
    })

  test("exact round trips across data shapes and levels") {
    fixtures.foreach(rt(_))
    fixtures.foreach(rt(_, 9))
  }

  test("multi-block: input larger than a level-1 block") {
    val rnd = new scala.util.Random(3)
    val big = Array.fill[Byte](250000)(('a' + rnd.nextInt(4)).toByte)
    rt(big, 1) // 100k blocks -> 3 blocks
  }

  test("concatenated streams decode as one payload") {
    val a = Bzip2.encode("first ".getBytes)
    val b = Bzip2.encode("second".getBytes, 2)
    assert(Bzip2.decode(a ++ b).get.sameElements("first second".getBytes))
    // trailing garbage after a valid stream rejects
    assert(Bzip2.decode(a :+ 0x00.toByte).isEmpty)
  }

  test("differential: commons-compress writer -> our reader") {
    import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
    for (data <- fixtures; level <- Seq(1, 9)) {
      val buf = new java.io.ByteArrayOutputStream()
      val z = new BZip2CompressorOutputStream(buf, level)
      z.write(data); z.close()
      val dec = Bzip2.decode(buf.toByteArray)
      assert(dec.isDefined,
        s"their stream (level $level, ${data.length} bytes) rejected")
      assert(dec.get.sameElements(data))
    }
  }

  test("differential: our writer -> commons-compress reader") {
    import org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream
    for (data <- fixtures if data.nonEmpty; level <- Seq(1, 9)) {
      val enc = Bzip2.encode(data, level)
      val in = new BZip2CompressorInputStream(
        new java.io.ByteArrayInputStream(enc), true)
      val got = in.readAllBytes()
      in.close()
      assert(got.sameElements(data),
        s"they mis-read our stream (level $level, ${data.length} bytes)")
    }
  }

  test("mutation fuzz: every single-byte corruption rejects or decodes clean") {
    val data = ("banana banana banana! " * 20).getBytes
    val enc = Bzip2.encode(data)
    for (i <- enc.indices; delta <- Seq(1, 0x80)) {
      val bad = enc.clone()
      bad(i) = (bad(i) + delta).toByte
      Bzip2.decode(bad) match {
        case None      => // rejected: good
        case Some(got) =>
          // only acceptable if the corruption landed in a bit the
          // format never reads (final padding) — output must be exact
          assert(got.sameElements(data),
            s"corruption at byte $i delta $delta INVENTED data")
      }
    }
  }

  test("garbage fuzz never throws") {
    val rnd = new scala.util.Random(0xb21b)
    for (_ <- 0 until 3000) {
      val junk = Array.fill(rnd.nextInt(80))(rnd.nextInt().toByte)
      Bzip2.decode(junk) // must not throw
    }
    // plausible header + junk body
    for (_ <- 0 until 500) {
      val junk = "BZh1".getBytes ++
        Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      Bzip2.decode(junk)
    }
  }

  test("randomised bit rejects (deprecated format feature)") {
    // craft: take a valid stream and set the randomised bit, which
    // lives right after the 48-bit block magic + 32-bit CRC. Flipping
    // it invalidates CRC interpretation anyway — assert rejection.
    val enc = Bzip2.encode("hello hello hello".getBytes)
    // block magic starts at byte 4; bit offset of randomised flag =
    // 4*8 + 48 + 32 = 112 bits = byte 14, bit 0 (MSB)
    val bad = enc.clone()
    bad(14) = (bad(14) | 0x80).toByte
    assert(Bzip2.decode(bad).isEmpty)
  }

  test("rotation sort agrees with brute force") {
    val rnd = new scala.util.Random(11)
    for (n <- Seq(1, 2, 3, 7, 32, 257)) {
      val b = Array.fill[Byte](n)(('a' + rnd.nextInt(3)).toByte)
      val got = Bzip2.rotationSort(b).toSeq
      val want = (0 until n).sortBy(i =>
        new String((0 until n).map(k => b((i + k) % n).toChar).toArray))
      // keys may tie (periodic strings) — compare by rotation CONTENT
      def rot(i: Int) = (0 until n).map(k => b((i + k) % n)).toSeq
      assert(got.map(rot) == want.map(rot))
    }
  }

  test("bomb guard: decoded output beyond maxOut rejects") {
    val big = Array.fill[Byte](100000)('z')
    val enc = Bzip2.encode(big)
    assert(Bzip2.decode(enc, maxOut = 1000).isEmpty)
    assert(Bzip2.decode(enc, maxOut = 100000).isDefined)
  }

  test("sniff") {
    assert(Bzip2.isBzip2(Bzip2.encode("x".getBytes)))
    assert(!Bzip2.isBzip2("BZh0".getBytes))
    assert(!Bzip2.isBzip2("PK".getBytes))
  }
}
