package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** SubRip build/parse pins: exact round trip, timestamp arithmetic at
  * the field boundaries, CRLF tolerance, and the strict-but-skipping
  * contract on malformed blocks (drop, never invent, keep walking). */
class SrtSpec extends AnyFunSuite {
  import Srt._

  test("build → parse round-trips cues exactly") {
    val cues = Seq(
      (0L, 2500L, "Hello world"),
      (2600L, 5000L, "Second cue"),
      (3599999L, 3600000L, "hour boundary"),
      (86399999L, 86400000L, "day boundary"),
      (7L, 7L, "zero-length"))
    val parsed = parse(build(cues))
    assert(parsed.map(c => (c.startMs, c.endMs, c.text)) == cues)
    assert(parsed.map(_.idx) == Seq(1, 2, 3, 4, 5))
  }

  test("timestamps render zero-padded and re-parse at edges") {
    val one = parse(build(Seq((3661001L, 3661002L, "x"))))
    assert(one.head.startMs == 3661001L) // 01:01:01,001
    assert(build(Seq((3661001L, 3661002L, "x")))
      .contains("01:01:01,001 --> 01:01:01,002"))
  }

  test("CRLF files and multi-line cue text parse") {
    val srt = "1\r\n00:00:00,000 --> 00:00:01,000\r\nline a\r\nline b\r\n" +
      "\r\n2\r\n00:00:01,100 --> 00:00:02,000\r\nc\r\n"
    val parsed = parse(srt)
    assert(parsed.size == 2)
    assert(parsed.head.text == "line a\nline b")
  }

  test("malformed blocks drop without inventing cues, walk continues") {
    val good = "3\n00:00:09,000 --> 00:00:10,000\nok"
    for (bad <- Seq(
      "x\n00:00:00,000 --> 00:00:01,000\nbad index",
      "1\n00:00:00,000 -> 00:00:01,000\nbad arrow",
      "1\n00:00:02,000 --> 00:00:01,000\nnegative range",
      "0\n00:00:00,000 --> 00:00:01,000\nzero index",
      "1\n0:00:00,000 --> 00:00:01,000\nshort hours",
      "lonely line")) {
      val parsed = parse(s"$bad\n\n$good")
      assert(parsed.size == 1, s"case: $bad")
      assert(parsed.head.text == "ok")
    }
    assert(parse("").isEmpty)
    assert(parse("\n\n\n").isEmpty)
  }

  test("seeded garbage never throws") {
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 300) {
      val s = new String(Array.fill(rnd.nextInt(200))(
        (rnd.nextInt(96) + 32).toChar))
      parse(s) // must not throw
    }
  }
}
