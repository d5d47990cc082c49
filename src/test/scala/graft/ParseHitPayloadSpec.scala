package graft

import graft.functions.ParseHitPayload
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The single-pass wire-decoder kernel must agree with the decimal-cast
  * column formulation it replaced, and reject exactly what the
  * reference's guards reject. */
class ParseHitPayloadSpec extends AnyFunSuite {

  private def parse(s: String) =
    Option(ParseHitPayload.parse(UTF8String.fromString(s)))

  test("well-formed payload parses to the exact nanos and ints") {
    val r = parse("1723460000.123456789 1723460001.000000002 37 514 1 1 1").get
    assert(r.getLong(0) == 1723460000123456789L)
    assert(r.getLong(1) == 1723460001000000002L)
    assert(r.getLong(2) == 37L)
    assert(r.getInt(3) == 514 && r.getInt(4) == 1)
  }

  test("guards: token count, field width, leading dot") {
    assert(parse("1.0 2.0 3 4 5 6").isEmpty) // 6 tokens
    assert(parse("1.000000000 1723460001.000000000 3 4 5 6 7").isEmpty) // short f0
    assert(parse(".123456789012345678 1723460001.000000000 3 4 5 6 7").isEmpty)
    assert(parse("1723460000.123456789 .12345678901234567 3 4 5 6 7").isEmpty)
  }

  test("malformed fields null the record") {
    assert(parse("1723460000.12345678x 1723460001.000000000 3 4 5 6 7").isEmpty)
    assert(parse("1723460000.123456789 1723460001.000000000 x 4 5 6 7").isEmpty)
    assert(parse("1723460000.123456789 1723460001.000000000 3 4 5 6 -").isEmpty)
    assert(parse("1723460000. 1723460001.0000000000 3 4 5 6 7").isEmpty) // empty frac
  }

  test("extra tokens ignored; negative ints parse; sub-9 fraction pads") {
    val r = parse("1723460000.12345678 1723460001.000000000000 -3 4 5 6 7 extra").get
    assert(r.getLong(0) == 1723460000123456780L)
    assert(r.getLong(2) == -3L)
  }

  test("10th fraction digit rounds HALF_UP like CAST(DECIMAL(30,9))") {
    val a = parse("1723460000.1234567895 1723460001.0000000004 3 4 5 6 7").get
    assert(a.getLong(0) == 1723460000123456790L) // .5 at digit 10 rounds up
    assert(a.getLong(1) == 1723460001000000000L) // .4 truncates
  }

  test("out-of-range fields reject instead of wrapping or truncating") {
    // 20-digit integer would wrap a Long accumulator
    val big = "98765432109876543210"
    assert(parse(s"1723460000.123456789 1723460001.000000000 $big 4 5 6 7").isEmpty)
    // i32 fields larger than Int.MaxValue must drop the record, not
    // silently truncate via .toInt
    assert(parse("1723460000.123456789 1723460001.000000000 3 4294967296 5 6 7").isEmpty)
    assert(parse("1723460000.123456789 1723460001.000000000 3 4 5 6 2147483648").isEmpty)
    // Int.MaxValue itself still parses
    val ok = parse("1723460000.123456789 1723460001.000000000 3 2147483647 5 6 7").get
    assert(ok.getInt(3) == Int.MaxValue)
    // seconds too large for the ×1e9 nanos representation reject
    assert(parse("99999999999.000000000 1723460001.000000000 3 4 5 6 7").isEmpty)
    // time_acc is a Long field: values above i32 are fine there
    val ta = parse("1723460000.123456789 1723460001.000000000 9999999999 4 5 6 7").get
    assert(ta.getLong(2) == 9999999999L)
  }

  test("parity with the decimal-cast formula on random payloads") {
    val rnd = new scala.util.Random(7L)
    for (_ <- 1 to 500) {
      val sec = 1000000000L + rnd.nextLong(1000000000L)
      val frac = rnd.nextLong(1000000000L)
      val s = f"$sec%d.$frac%09d"
      val expect = (BigDecimal(s).setScale(9) * 1000000000L).toLongExact
      val r = parse(s"$s $s 1 2 3 4 5").get
      assert(r.getLong(0) == expect, s)
    }
  }
}
