package graft.functions

/** UTF-8 validation + mojibake repair — the standard curation pass a
  * web-scale text pipeline runs before anything else (the core case
  * of the public `ftfy` tool): text that was UTF-8 ENCODED but then
  * DECODED as Windows-1252 reads "Ã©" where "é" was meant and "â€™"
  * where a right quote was; the damage composes under re-scraping
  * (double/triple encoding). The repair inverts exactly that
  * composition and nothing else.
  *
  * Detection rule (conservative, whole-string): a string is treated
  * as mojibake only when EVERY char maps back to a CP1252 byte AND
  * the resulting byte string is STRICTLY valid UTF-8 (no overlongs,
  * no surrogates, ≤ U+10FFFF) with at least one multibyte sequence.
  * Legitimate Latin-1 text ("café") fails the valid-UTF-8 test (a
  * lone 0xE9 is not a UTF-8 sequence), so it is never touched —
  * false positives would corrupt clean data, the one unforgivable
  * failure for this pass. Repair iterates (≤ 4 rounds) to unwind
  * stacked double-encodings.
  *
  * The CP1252 byte↔char table is the public Unicode.org mapping;
  * the five bytes the codepage leaves undefined (0x81 0x8D 0x8F
  * 0x90 0x9D) map to their C1 controls — what lenient decoders
  * (and ftfy's "cp1252 with fallback") do, and what makes the
  * round trip total on real scraped bytes. No reference analogue
  * (north-star curation surface); validated by classic-case pins,
  * inverse round trips and fuzz in FixEncodingSpec, plus the
  * `text_fix_encoding` gate query with an analytic DuckDB oracle. */
object FixEncoding {

  /** char value for CP1252 bytes 0x80–0x9F (index - 0x80); all other
    * bytes decode to their own code point. */
  private final val Hi: Array[Char] = Array(
    '\u20AC', '\u0081', '\u201A', '\u0192', '\u201E', '\u2026',
    '\u2020', '\u2021', '\u02C6', '\u2030', '\u0160', '\u2039',
    '\u0152', '\u008D', '\u017D', '\u008F', '\u0090', '\u2018',
    '\u2019', '\u201C', '\u201D', '\u2022', '\u2013', '\u2014',
    '\u02DC', '\u2122', '\u0161', '\u203A', '\u0153', '\u009D',
    '\u017E', '\u0178')

  /** char → CP1252 byte, or -1 when the char has none. */
  private final val Inv: java.util.HashMap[Char, Int] = {
    val m = new java.util.HashMap[Char, Int]()
    var b = 0
    while (b < 256) {
      val c = if (b >= 0x80 && b <= 0x9f) Hi(b - 0x80) else b.toChar
      m.put(c, b)
      b += 1
    }
    m
  }

  /** Decode bytes as CP1252 (total — every byte has a char). */
  def cp1252Decode(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sb.append(if (b >= 0x80 && b <= 0x9f) Hi(b - 0x80) else b.toChar)
      i += 1
    }
    sb.toString
  }

  /** Encode to CP1252; None when any char is outside the codepage. */
  def cp1252Encode(s: String): Option[Array[Byte]] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val v = Inv.getOrDefault(s.charAt(i), -1)
      if (v < 0) return None
      out(i) = v.toByte
      i += 1
    }
    Some(out)
  }

  /** Encode to ISO-8859-1 (chars ≤ 0xFF are their own byte); None
    * when any char is outside. The second classic mojibake family:
    * UTF-8 decoded as LATIN-1 yields C1 controls (U+0080–U+009F)
    * where CP1252 damage yields €‚ƒ… punctuation — "â€™" vs
    * "â" for the same right quote. */
  def latin1Encode(s: String): Option[Array[Byte]] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 0xff) return None
      out(i) = c.toByte
      i += 1
    }
    Some(out)
  }

  /** Decode bytes as ISO-8859-1 (total). */
  def latin1Decode(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append((bytes(i) & 0xff).toChar); i += 1 }
    sb.toString
  }

  /** Strict UTF-8 validation: returns the number of MULTIBYTE
    * sequences when valid, or -1 on any malformation (truncated or
    * stray continuation, overlong form, surrogate, > U+10FFFF). */
  def utf8MultibyteCount(b: Array[Byte]): Int = {
    var i = 0
    var multi = 0
    while (i < b.length) {
      val x = b(i) & 0xff
      if (x < 0x80) i += 1
      else if (x < 0xc0) return -1 // stray continuation
      else {
        val (n, min, max) =
          if (x < 0xe0) (1, 0x80, 0x7ff)
          else if (x < 0xf0) (2, 0x800, 0xffff)
          else if (x < 0xf5) (3, 0x10000, 0x10ffff)
          else return -1
        var cp = x & (0x3f >> n)
        var k = 1
        while (k <= n) {
          if (i + k >= b.length) return -1
          val c = b(i + k) & 0xff
          if (c < 0x80 || c >= 0xc0) return -1
          cp = (cp << 6) | (c & 0x3f)
          k += 1
        }
        if (cp < min || cp > max) return -1 // overlong / out of range
        if (cp >= 0xd800 && cp <= 0xdfff) return -1 // surrogate
        multi += 1
        i += n + 1
      }
    }
    multi
  }

  /** True when `bytes` is strictly valid UTF-8. */
  def utf8Valid(bytes: Array[Byte]): Boolean =
    utf8MultibyteCount(bytes) >= 0

  /** Repair CP1252-decoded-UTF-8 mojibake: returns (repaired text,
    * rounds applied). 0 rounds = the input was not mojibake and is
    * returned untouched. */
  def repair(s: String, maxRounds: Int = 4): (String, Int) = {
    var cur = s
    var rounds = 0
    var go = true
    while (go && rounds < maxRounds) {
      // CP1252 first (the common scrape damage); when a char has no
      // CP1252 byte — e.g. the C1 controls LATIN-1 damage leaves —
      // fall back to the Latin-1 inverse. Where both succeed they
      // produce identical bytes (the encodings agree outside
      // 0x80–0x9F, and the five shared control slots map the same),
      // so the order cannot change a result, only extend coverage.
      val bytes = cp1252Encode(cur)
        .filter(utf8MultibyteCount(_) > 0)
        .orElse(latin1Encode(cur).filter(utf8MultibyteCount(_) > 0))
      bytes match {
        case Some(b) =>
          cur = new String(b, java.nio.charset.StandardCharsets.UTF_8)
          rounds += 1
        case None => go = false
      }
    }
    (cur, rounds)
  }

  /** The corruption [[repair]] inverts: UTF-8 bytes read back as
    * CP1252 — or as LATIN-1 when `latin1` (identity on pure-ASCII
    * text either way). Fixture builder for the gate query and specs. */
  def mojibake(s: String, rounds: Int = 1, latin1: Boolean = false)
      : String = {
    var cur = s
    var i = 0
    while (i < rounds) {
      val bytes = cur.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      cur = if (latin1) latin1Decode(bytes) else cp1252Decode(bytes)
      i += 1
    }
    cur
  }
}
