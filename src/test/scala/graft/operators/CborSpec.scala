package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** CBOR pins: RFC 8949 Appendix A's own example vectors (integers,
  * floats incl. binary16 specials, strings, arrays, maps, tags,
  * simples), deterministic shortest-form encoding, indefinite-length
  * decode for all four majors, uint64-above-Long and
  * below-Long.MinValue handling, well-formedness rejections (stray
  * break, nested indefinite chunks, reserved arguments, truncation,
  * trailing bytes, bad UTF-8), depth/budget guards, and fuzz. */
class CborSpec extends AnyFunSuite {

  import Cbor._

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def rt(v: Cb): Unit = {
    val got = decode(encode(v))
    assert(got.isDefined, s"round trip rejected $v")
    assertSame(got.get, v)
  }

  private def assertSame(a: Cb, b: Cb): Unit = (a, b) match {
    case (CbBytes(x), CbBytes(y)) => assert(x.sameElements(y))
    case (CbArr(x), CbArr(y)) =>
      assert(x.length == y.length)
      x.zip(y).foreach { case (p, q) => assertSame(p, q) }
    case (CbMap(x), CbMap(y)) =>
      assert(x.length == y.length)
      x.zip(y).foreach { case ((k1, v1), (k2, v2)) =>
        assertSame(k1, k2); assertSame(v1, v2) }
    case (CbTag(t1, x), CbTag(t2, y)) =>
      assert(t1 == t2); assertSame(x, y)
    case (CbFloat(x), CbFloat(y)) =>
      assert(java.lang.Float.floatToIntBits(x) ==
        java.lang.Float.floatToIntBits(y))
    case (CbDouble(x), CbDouble(y)) =>
      assert(java.lang.Double.doubleToLongBits(x) ==
        java.lang.Double.doubleToLongBits(y))
    case _ => assert(a == b)
  }

  test("RFC 8949 Appendix A integer vectors encode byte-exact") {
    val vectors = Seq(
      CbInt(0) -> "00", CbInt(1) -> "01", CbInt(10) -> "0a",
      CbInt(23) -> "17", CbInt(24) -> "1818", CbInt(25) -> "1819",
      CbInt(100) -> "1864", CbInt(1000) -> "1903e8",
      CbInt(1000000) -> "1a000f4240",
      CbInt(1000000000000L) -> "1b000000e8d4a51000",
      CbUint(-1L) -> "1bffffffffffffffff", // 18446744073709551615
      CbInt(-1) -> "20", CbInt(-10) -> "29", CbInt(-100) -> "3863",
      CbInt(-1000) -> "3903e7")
    vectors.foreach { case (v, h) =>
      assert(encode(v).sameElements(hex(h)), s"$v -> $h")
      assertSame(decode(hex(h)).get, v)
    }
  }

  test("RFC 8949 Appendix A float and simple vectors") {
    // binary16 decodes to CbFloat with the exact value
    assertSame(decode(hex("f90000")).get, CbFloat(0.0f))
    assertSame(decode(hex("f93c00")).get, CbFloat(1.0f))
    assertSame(decode(hex("f97bff")).get, CbFloat(65504.0f))
    assertSame(decode(hex("f90001")).get,
      CbFloat(math.pow(2, -24).toFloat))
    assert(decode(hex("f97c00")).get.asInstanceOf[CbFloat]
      .v.isPosInfinity)
    assert(decode(hex("f9fc00")).get.asInstanceOf[CbFloat]
      .v.isNegInfinity)
    assert(decode(hex("f97e00")).get.asInstanceOf[CbFloat].v.isNaN)
    assert(encode(CbFloat(100000.0f)).sameElements(
      hex("fa47c35000")))
    assert(encode(CbDouble(1.1)).sameElements(
      hex("fb3ff199999999999a")))
    assert(encode(CbDouble(-4.1)).sameElements(
      hex("fbc010666666666666")))
    assert(encode(CbBool(false)).sameElements(hex("f4")))
    assert(encode(CbBool(true)).sameElements(hex("f5")))
    assert(encode(CbNull).sameElements(hex("f6")))
    assert(encode(CbUndef).sameElements(hex("f7")))
    assert(encode(CbSimple(16)).sameElements(hex("f0")))
    assert(encode(CbSimple(255)).sameElements(hex("f8ff")))
    assertSame(decode(hex("f8ff")).get, CbSimple(255))
  }

  test("RFC 8949 Appendix A string/array/map/tag vectors") {
    assert(encode(CbStr("")).sameElements(hex("60")))
    assert(encode(CbStr("a")).sameElements(hex("6161")))
    assert(encode(CbStr("IETF")).sameElements(hex("6449455446")))
    assert(encode(CbStr("ü")).sameElements(hex("62c3bc")))
    assert(encode(CbStr("水")).sameElements(hex("63e6b0b4")))
    assert(encode(CbBytes(hex("01020304"))).sameElements(
      hex("4401020304")))
    assert(encode(CbArr(Seq())).sameElements(hex("80")))
    assert(encode(CbArr(Seq(CbInt(1), CbInt(2), CbInt(3))))
      .sameElements(hex("83010203")))
    assert(encode(CbArr((1 to 25).map(i => CbInt(i.toLong))))
      .sameElements(hex(
        "98190102030405060708090a0b0c0d0e0f101112131415161718181819")))
    assert(encode(CbMap(Seq(CbInt(1) -> CbInt(2),
      CbInt(3) -> CbInt(4)))).sameElements(hex("a201020304")))
    assert(encode(CbMap(Seq(CbStr("a") -> CbInt(1),
      CbStr("b") -> CbArr(Seq(CbInt(2), CbInt(3))))))
      .sameElements(hex("a26161016162820203")))
    // tag 1 (epoch seconds), RFC example c1 1a514b67b0
    assert(encode(CbTag(1, CbInt(1363896240))).sameElements(
      hex("c11a514b67b0")))
    assertSame(decode(hex("c11a514b67b0")).get,
      CbTag(1, CbInt(1363896240)))
  }

  test("indefinite-length forms decode (RFC Appendix A)") {
    // (_ h'0102', h'030405') -> h'0102030405'
    assertSame(decode(hex("5f42010243030405ff")).get,
      CbBytes(hex("0102030405")))
    // (_ "strea", "ming") -> "streaming"
    assertSame(decode(hex("7f657374726561646d696e67ff")).get,
      CbStr("streaming"))
    // [_ ] and [_ 1, [2, 3], [_ 4, 5]]
    assertSame(decode(hex("9fff")).get, CbArr(Seq()))
    assertSame(decode(hex("9f018202039f0405ffff")).get,
      CbArr(Seq(CbInt(1), CbArr(Seq(CbInt(2), CbInt(3))),
        CbArr(Seq(CbInt(4), CbInt(5))))))
    // {_ "a": 1, "b": [_ 2, 3]}
    assertSame(decode(hex("bf61610161629f0203ffff")).get,
      CbMap(Seq(CbStr("a") -> CbInt(1),
        CbStr("b") -> CbArr(Seq(CbInt(2), CbInt(3))))))
  }

  test("canonical round trips across families") {
    rt(CbInt(Long.MaxValue)); rt(CbInt(Long.MinValue))
    rt(CbUint(-1L)); rt(CbUint(Long.MinValue))
    rt(CbFloat(3.4028235e38f)); rt(CbDouble(-0.0))
    rt(CbStr("héllo wörld €"))
    rt(CbBytes(Array.tabulate(300)(_.toByte))) // 2-byte length
    rt(CbArr(Seq(CbNull, CbUndef, CbBool(true), CbSimple(19))))
    rt(CbMap(Seq(CbInt(-5) -> CbTag(42,
      CbMap(Seq(CbStr("k") -> CbBytes(Array[Byte](1))))))))
    rt(CbTag(0xffffffffL, CbInt(0)))
  }

  test("malformed inputs reject, never throw") {
    assert(decode(Array.emptyByteArray).isEmpty)
    assert(decode(hex("ff")).isEmpty)           // stray break
    assert(decode(hex("18")).isEmpty)           // truncated arg
    assert(decode(hex("1c")).isEmpty)           // reserved ai 28
    assert(decode(hex("5f00ff")).isEmpty)       // wrong-major chunk
    assert(decode(hex("5f5f41" + "61ffff")).isEmpty) // nested indef chunk
    assert(decode(hex("c1ff")).isEmpty)         // break as tag content
    assert(decode(hex("0001")).isEmpty)         // trailing bytes
    assert(decode(hex("62ff00")).isEmpty)       // invalid UTF-8
    assert(decode(hex("f818")).isEmpty)         // 2-byte simple < 32
    assert(decode(hex("3bffffffffffffffff")).isEmpty) // < Long.Min
    assert(decode(hex("81")).isEmpty)           // missing array elem
    assert(decode(hex("a16161")).isEmpty)       // missing map value
    assert(decode(hex("9f01")).isEmpty)         // unterminated indef
    // depth bomb: 70 nested arrays
    assert(decode(Array.fill(70)(0x81.toByte) :+ 0x00.toByte).isEmpty)
    // element bomb: definite array claiming 2^32 elements
    assert(decode(hex("9affffffff")).isEmpty)
  }

  test("fuzz: random bytes and single-byte mutations never throw") {
    val rnd = new scala.util.Random(23)
    val base = encode(CbMap(Seq(
      CbStr("id") -> CbInt(7),
      CbStr("xs") -> CbArr(Seq(CbFloat(1.5f), CbNull)),
      CbStr("b") -> CbBytes(Array[Byte](1, 2, 3)))))
    (0 until 400).foreach { _ =>
      val m = base.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      decode(m)
    }
    (0 until 400).foreach { _ =>
      decode(Array.fill(rnd.nextInt(40))(rnd.nextInt().toByte))
    }
  }
}
