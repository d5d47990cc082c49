package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** TFRecord framing pins: the Castagnoli check value, the mask
  * arithmetic, exact round trips, and the corruption/truncation walk
  * rules. */
class TfRecordSpec extends AnyFunSuite {

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  test("CRC32C is Castagnoli: the classic '123456789' check value") {
    val c = new java.util.zip.CRC32C
    c.update("123456789".getBytes("US-ASCII"))
    assert(c.getValue == 0xE3069283L)
  }

  test("mask: rotate-right-15 plus delta, 32-bit wrap") {
    // rot15(0) + delta = delta; and a wrap case
    assert(TfRecord.mask(0L) == 0xa282ead8L)
    // rot15(0xffffffff) = 0xffffffff; + delta wraps to 0xa282ead7
    assert(TfRecord.mask(0xffffffffL) == 0xa282ead7L)
  }

  test("records round-trip: lengths, md5s, walk order; empty payload") {
    val bodies = Seq("hello", "", "x" * 3000).map(_.getBytes("UTF-8"))
    val shard = TfRecord.buildShard(bodies.map(TfRecord.buildRecord))
    val out = TfRecord.parse(shard)
    assert(out.map(_.length) == bodies.map(_.length.toLong))
    assert(out.map(_.md5) == bodies.map(md5hex))
    // dataOff indexes the payload in place
    assert(new String(shard, out.head.dataOff, 5, "UTF-8") == "hello")
  }

  test("either CRC flipping ends the walk; truncation too") {
    val good = TfRecord.buildRecord("aaaa".getBytes)
    val r2 = TfRecord.buildRecord("bbbb".getBytes)
    // flip a byte of the SECOND record's length crc
    val s1 = TfRecord.buildShard(Seq(good, r2.clone()))
    s1(good.length + 9) = (s1(good.length + 9) ^ 1).toByte
    assert(TfRecord.parse(s1).map(_.md5) == Seq(md5hex("aaaa".getBytes)))
    // flip a payload byte → data crc mismatch
    val s2 = TfRecord.buildShard(Seq(good.clone()))
    s2(13) = (s2(13) ^ 0x40).toByte
    assert(TfRecord.parse(s2).isEmpty)
    assert(TfRecord.parse(good.dropRight(1)).isEmpty)
    assert(TfRecord.parse(Array.emptyByteArray).isEmpty)
  }
}
