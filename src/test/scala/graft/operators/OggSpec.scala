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

  test("OpusHead/OpusTags round-trip; malformed packets reject") {
    val head = Ogg.buildOpusHead(2, 312, 48000L, -256)
    val h = Ogg.parseOpusHead(head)
    assert(h.contains(Ogg.OpusHead(1, 2, 312, 48000L, -256, 0)))
    val tags = Ogg.buildOpusTags("vendor é",
      Seq("TITLE=x", "LICENSE=CC0", "LANGUAGE=en"))
    val t = Ogg.parseOpusTags(tags)
    assert(t.contains(("vendor é",
      Seq("TITLE=x", "LICENSE=CC0", "LANGUAGE=en"))))
    // malformed: bad magic, truncation at every length, crafted
    // overlong vendor/comment lengths never invent entries
    assert(Ogg.parseOpusHead("OpusHeadX".getBytes("US-ASCII")).isEmpty)
    assert(Ogg.parseOpusTags("OpusTagsFF".getBytes("US-ASCII")).isEmpty)
    for (cut <- 0 until tags.length)
      Ogg.parseOpusTags(java.util.Arrays.copyOfRange(tags, 0, cut))
    val evil = tags.clone()
    evil(8) = -1; evil(9) = -1; evil(10) = -1; evil(11) = -1 // vendor len
    assert(Ogg.parseOpusTags(evil).isEmpty)
    val evil2 = tags.clone()
    // comment count absurdly large must reject, not loop
    val ncAt = 8 + 4 + "vendor é".getBytes("UTF-8").length
    evil2(ncAt) = -1; evil2(ncAt + 1) = -1
    evil2(ncAt + 2) = -1; evil2(ncAt + 3) = -1
    assert(Ogg.parseOpusTags(evil2).isEmpty)
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
