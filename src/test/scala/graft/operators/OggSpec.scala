package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Ogg page framing pins: packet round trips across every lacing
  * shape (empty, exact-255 multiples, the 255×255 page cap,
  * multi-page continuation), page-flag layout, the Ogg CRC-32
  * variant cross-checked against an INDEPENDENT table-driven
  * implementation, and corruption/garbage rejection. */
class OggSpec extends AnyFunSuite {

  private def pkt(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 31 + seed * 7) % 251).toByte)

  test("packets round-trip across every lacing shape") {
    val packets = Seq(
      pkt(0, 1),            // empty packet → [0] lacing
      pkt(3, 2),
      pkt(254, 3),
      pkt(255, 4),          // exact multiple → 255 + [0] terminator
      pkt(256, 5),
      pkt(700, 6),
      pkt(255 * 255, 7),    // exactly one full page + [0] page
      pkt(255 * 255 + 10, 8)) // true continuation
    val granules = packets.indices.map(i => (i + 1) * 960L)
    val ogg = Ogg.build(77L, packets, granules)
    val got = Ogg.parsePackets(ogg)
    assert(got.size == packets.size)
    for (((b, g), i) <- got.zipWithIndex) {
      assert(b.toSeq == packets(i).toSeq, s"packet $i bytes")
      assert(g == granules(i), s"packet $i granule")
    }
    val pages = Ogg.parsePages(ogg)
    assert(pages.head.bos && !pages.head.continued)
    assert(pages.last.eos)
    assert(pages.count(_.bos) == 1 && pages.count(_.eos) == 1)
    assert(pages.forall(_.serial == 77L))
    assert(pages.map(_.seqNo) == pages.indices.map(_.toLong))
    // the two oversized packets produce continued pages
    assert(pages.count(_.continued) == 2)
    // continued intermediates carry the −1 granule marker
    assert(pages.filter(_.continued).forall(p =>
      p.granule != -1L || !p.eos))
  }

  test("Ogg CRC-32 agrees with an independent bitwise implementation") {
    // same polynomial spec, different code path (the operator is
    // table-driven; this reference shifts bit by bit)
    def refCrc(b: Array[Byte]): Long = {
      var crc = 0L
      for (x <- b) {
        crc ^= (x & 0xffL) << 24
        var k = 0
        while (k < 8) {
          crc = if ((crc & 0x80000000L) != 0)
            ((crc << 1) ^ 0x04C11DB7L) & 0xffffffffL
          else (crc << 1) & 0xffffffffL
          k += 1
        }
      }
      crc
    }
    val rnd = new scala.util.Random(5)
    for (len <- Seq(0, 1, 9, 100, 1000)) {
      val b = Array.fill(len)(rnd.nextInt(256).toByte)
      assert(Ogg.crc32(b, 0, b.length) == refCrc(b), s"len $len")
    }
  }

  test("single-bit corruption rejects via the page CRC; never throws") {
    val ogg = Ogg.build(9L, Seq(pkt(400, 1), pkt(300, 2)), Seq(100L, 200L))
    assert(Ogg.parsePages(ogg).size == 2)
    val rnd = new scala.util.Random(11)
    var rejectedSome = 0
    for (_ <- 0 until 300) {
      val m = ogg.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      val pages = Ogg.parsePages(m) // must not throw
      if (pages.size < 2) rejectedSome += 1
    }
    assert(rejectedSome == 300, s"only $rejectedSome/300 flips detected")
    // garbage and truncations
    for (cut <- 0 until math.min(ogg.length, 120))
      Ogg.parsePackets(java.util.Arrays.copyOfRange(ogg, 0, cut))
    assert(Ogg.parsePages("OggSjunk".getBytes("US-ASCII")).isEmpty)
  }
}
