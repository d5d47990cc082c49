package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MessagePack pins: the spec's own published example, hand-pinned
  * bytes per format family (incl. every integer boundary), canonical
  * round trips, uint64-above-Long handling, strict-UTF-8 and
  * trailing-byte rejection, depth/bomb guards, and garbage fuzz. */
class MsgpackSpec extends AnyFunSuite {

  import Msgpack._

  private def rt(v: Mp): Unit = {
    val got = decode(encode(v))
    assert(got.isDefined, s"round trip rejected $v")
    assertSame(got.get, v)
  }

  private def assertSame(a: Mp, b: Mp): Unit = (a, b) match {
    case (MpBin(x), MpBin(y)) => assert(x.sameElements(y))
    case (MpExt(t1, x), MpExt(t2, y)) =>
      assert(t1 == t2 && x.sameElements(y))
    case (MpArr(x), MpArr(y)) =>
      assert(x.length == y.length)
      x.zip(y).foreach { case (p, q) => assertSame(p, q) }
    case (MpMap(x), MpMap(y)) =>
      assert(x.length == y.length)
      x.zip(y).foreach { case ((k1, v1), (k2, v2)) =>
        assertSame(k1, k2); assertSame(v1, v2) }
    case (MpFloat(x), MpFloat(y)) =>
      assert(java.lang.Float.floatToIntBits(x) ==
        java.lang.Float.floatToIntBits(y))
    case (MpDouble(x), MpDouble(y)) =>
      assert(java.lang.Double.doubleToLongBits(x) ==
        java.lang.Double.doubleToLongBits(y))
    case _ => assert(a == b)
  }

  test("the spec's own example: {\"compact\":true,\"schema\":0}") {
    val v = MpMap(Seq(MpStr("compact") -> MpBool(true),
      MpStr("schema") -> MpInt(0)))
    val want = Array(0x82, 0xa7, 'c', 'o', 'm', 'p', 'a', 'c', 't',
      0xc3, 0xa6, 's', 'c', 'h', 'e', 'm', 'a', 0x00).map(_.toByte)
    assert(encode(v).sameElements(want))
    assertSame(decode(want).get, v)
  }

  test("integer boundaries take their minimal forms") {
    def form(n: Long): Int = encode(MpInt(n))(0) & 0xff
    assert(form(0) == 0x00 && form(127) == 0x7f)
    assert(form(128) == 0xcc && form(255) == 0xcc)
    assert(form(256) == 0xcd && form(65535) == 0xcd)
    assert(form(65536) == 0xce && form((1L << 32) - 1) == 0xce)
    assert(form(1L << 32) == 0xcf && form(Long.MaxValue) == 0xcf)
    assert(form(-1) == 0xff && form(-32) == 0xe0)
    assert(form(-33) == 0xd0 && form(-128) == 0xd0)
    assert(form(-129) == 0xd1 && form(-32768) == 0xd1)
    assert(form(-32769) == 0xd2 && form(Int.MinValue.toLong) == 0xd2)
    assert(form(Int.MinValue - 1L) == 0xd3 && form(Long.MinValue) == 0xd3)
    for (n <- Seq(0L, 1L, 127L, 128L, 255L, 256L, 65535L, 65536L,
      (1L << 32) - 1, 1L << 32, Long.MaxValue, -1L, -32L, -33L, -128L,
      -129L, -32768L, -32769L, Int.MinValue.toLong, Long.MinValue))
      rt(MpInt(n))
  }

  test("uint64 above Long.MaxValue round-trips as MpUint") {
    val raw = 0xfedcba9876543210L // negative as a Long
    val enc = encode(MpUint(raw))
    assert((enc(0) & 0xff) == 0xcf)
    assertSame(decode(enc).get, MpUint(raw))
    // and cf with a small payload decodes as plain MpInt
    val small = Array(0xcf, 0, 0, 0, 0, 0, 0, 0, 5).map(_.toByte)
    assertSame(decode(small).get, MpInt(5))
  }

  test("every family round-trips, nested") {
    rt(MpNil)
    rt(MpBool(true)); rt(MpBool(false))
    rt(MpFloat(1.5f)); rt(MpFloat(Float.NaN))
    rt(MpDouble(-0.125)); rt(MpDouble(Double.PositiveInfinity))
    rt(MpStr("")); rt(MpStr("héllo wörld")); rt(MpStr("x" * 31))
    rt(MpStr("y" * 32)); rt(MpStr("z" * 300)); rt(MpStr("w" * 70000))
    rt(MpBin(Array[Byte]())); rt(MpBin(Array.tabulate[Byte](300)(_.toByte)))
    rt(MpExt(5, Array[Byte](1))); rt(MpExt(-1, Array.fill[Byte](8)(9)))
    rt(MpExt(7, Array.tabulate[Byte](11)(_.toByte)))
    rt(MpArr(Seq())); rt(MpArr((0 until 20).map(i => MpInt(i.toLong))))
    rt(MpMap(Seq(MpStr("k") -> MpArr(Seq(MpNil, MpBool(true),
      MpMap(Seq(MpInt(1) -> MpStr("v"))))))))
    // 70000-element array -> array32 header
    rt(MpArr(Seq.fill(70000)(MpInt(7))))
  }

  test("rejections: trailing bytes, truncation, 0xc1, bad UTF-8, depth") {
    assert(decode(encode(MpInt(5)) :+ 0x00.toByte).isEmpty)
    assert(decode(Array(0xc1.toByte)).isEmpty)
    assert(decode(Array(0xa3.toByte, 'a'.toByte)).isEmpty) // short str
    assert(decode(Array(0xa2.toByte, 0xff.toByte, 0xfe.toByte)).isEmpty)
    // 65-deep nesting rejects
    var v: Mp = MpInt(1)
    for (_ <- 0 until 64) v = MpArr(Seq(v))
    assert(decode(encode(v)).isDefined)
    val deeper = {
      val out = new java.io.ByteArrayOutputStream()
      for (_ <- 0 until 66) out.write(0x91)
      out.write(0x01)
      out.toByteArray
    }
    assert(decode(deeper).isEmpty)
    // bomb header: array32 claiming 2^31 elements on a 6-byte input
    assert(decode(Array(0xdd.toByte, 0x7f.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte, 0x01.toByte)).isEmpty)
  }

  test("garbage fuzz never throws") {
    val rnd = new scala.util.Random(0x3209)
    for (_ <- 0 until 4000) {
      val junk = Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      Msgpack.decode(junk)
    }
  }
}
