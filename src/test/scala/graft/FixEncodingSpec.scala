package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FixEncoding

/** Mojibake-repair pins: the classic Ã©/â€™ cases, double-encoding
  * unwind, the no-false-positive guarantee on legitimate Latin-1 and
  * ASCII, CP1252 table agreement with the JDK codec on every defined
  * byte, strict UTF-8 validation edges (overlongs, surrogates,
  * truncation), inverse round trips and fuzz. */
class FixEncodingSpec extends AnyFunSuite {

  test("classic single-encoding cases repair exactly") {
    assert(FixEncoding.repair("cafÃ©") == ("café", 1))
    // â€™ = U+2019 RIGHT SINGLE QUOTATION MARK through the damage
    assert(FixEncoding.repair("itâ€™s") == ("it’s", 1))
    assert(FixEncoding.repair("naÃ¯ve") == ("naïve", 1))
    // full sentence with mixed damage
    val (got, n) = FixEncoding.repair(
      "The teamâ€™s cafÃ© menu â€“ updated")
    assert(got == "The team’s café menu – updated")
    assert(n == 1)
  }

  test("latin-1 damage family (C1 controls) repairs too") {
    // UTF-8 decoded as ISO-8859-1: ’ becomes â + U+0080 + U+0099
    val damaged = "itâs cafÃ©"
    assert(FixEncoding.repair(damaged) == ("it’s café", 1))
    // double latin-1 damage unwinds in two rounds
    val orig = "déjà — vu"
    val twice = FixEncoding.mojibake(orig, rounds = 2, latin1 = true)
    assert(FixEncoding.repair(twice) == ((orig, 2)))
    // mojibake(latin1) differs from mojibake(cp1252) exactly on the
    // 0x80-0x9F image bytes, and repair inverts both
    val a = FixEncoding.mojibake("’", latin1 = false) // â€™
    val b = FixEncoding.mojibake("’", latin1 = true)  // â[U+0080][U+0099]
    assert(a == "â€™" && b == "â" && a != b)
    assert(FixEncoding.repair(a)._1 == "’" && FixEncoding.repair(b)._1 == "’")
  }

  test("double encoding unwinds in two rounds") {
    val orig = "déjà vu — twice"
    val twice = FixEncoding.mojibake(orig, rounds = 2)
    assert(twice != orig && FixEncoding.mojibake(orig) != twice)
    assert(FixEncoding.repair(twice) == ((orig, 2)))
  }

  test("no false positives: ASCII and legitimate Latin-1 untouched") {
    for (s <- Seq("plain ascii text", "café", "naïve résumé",
      "Größe läuft", "a\tb\nc", "")) {
      assert(FixEncoding.repair(s) == ((s, 0)), s)
    }
  }

  test("CP1252 table agrees with the JDK codec on defined bytes") {
    val undefined = Set(0x81, 0x8d, 0x8f, 0x90, 0x9d)
    for (b <- 0 until 256 if !undefined(b)) {
      val jdk = new String(Array(b.toByte), "windows-1252")
      assert(FixEncoding.cp1252Decode(Array(b.toByte)) == jdk,
        f"byte 0x$b%02x")
    }
    // the undefined five map to their C1 controls (lenient rule)
    for (b <- undefined)
      assert(FixEncoding.cp1252Decode(Array(b.toByte)).head.toInt == b)
    // encode is the exact inverse over all 256
    for (b <- 0 until 256) {
      val c = FixEncoding.cp1252Decode(Array(b.toByte))
      assert(FixEncoding.cp1252Encode(c).get.toSeq == Seq(b.toByte))
    }
    assert(FixEncoding.cp1252Encode("中").isEmpty) // outside page
  }

  test("strict UTF-8 validation edges") {
    import FixEncoding.{utf8Valid, utf8MultibyteCount}
    assert(utf8MultibyteCount("abc".getBytes("UTF-8")) == 0)
    assert(utf8MultibyteCount("café".getBytes("UTF-8")) == 1)
    assert(utf8MultibyteCount("中文".getBytes("UTF-8")) == 2)
    assert(utf8Valid("😀".getBytes("UTF-8"))) // 4-byte emoji
    assert(!utf8Valid(Array(0xe9.toByte))) // lone Latin-1 byte
    assert(!utf8Valid(Array(0xc0.toByte, 0xaf.toByte))) // overlong '/'
    assert(!utf8Valid(Array(0xe0.toByte, 0x80.toByte, 0x80.toByte)))
    assert(!utf8Valid(Array(0xed.toByte, 0xa0.toByte, 0x80.toByte))) // surrogate
    assert(!utf8Valid(Array(0xf5.toByte, 0x80.toByte, 0x80.toByte,
      0x80.toByte))) // > U+10FFFF lead
    assert(!utf8Valid("é".getBytes("UTF-8").take(1))) // truncated
    assert(!utf8Valid(Array(0x80.toByte))) // stray continuation
  }

  test("repair inverts mojibake for every BMP-heavy sample; fuzz") {
    val rnd = new scala.util.Random(0xf1f1)
    for (_ <- 0 until 2000) {
      // strings over chars CP1252 can NOT always express — repair
      // must never throw and never loop past maxRounds
      val junk = (0 until rnd.nextInt(24)).map(_ =>
        rnd.nextInt(0x3000).toChar).mkString
      val (_, n) = FixEncoding.repair(junk)
      assert(n <= 4)
    }
    for (_ <- 0 until 500) {
      // CP1252-expressible samples with each special followed by an
      // ASCII letter, so the ORIGINAL can never itself encode to
      // accidentally-valid multibyte UTF-8 (e.g. "Ñ€" → D1 80 →
      // U+0440 — a real, inherent ambiguity of the repair, excluded
      // by construction here)
      val chars = "é ü—€’…ñÑ§µ"
      val s = (0 until 1 + rnd.nextInt(12)).flatMap(_ =>
        Seq(chars(rnd.nextInt(chars.length)), 'x')).mkString
      val damaged = FixEncoding.mojibake(s)
      val (back, rounds) = FixEncoding.repair(damaged)
      if (s.exists(_ > 0x7f)) {
        assert(back == s, s"'$s' -> '$damaged' -> '$back'")
        assert(rounds == 1)
      } else assert(back == s && rounds == 0)
    }
  }
}
