package graft.operators

/** Minimal recursive-descent JSON reader shared by the format
  * operators that embed JSON documents inside binary envelopes —
  * [[Avro]] container schemas, [[Safetensors]] headers, the Delta
  * transaction log ([[DeltaLog]]). Deliberately tiny and strict:
  * values parse to plain Scala shapes (`Map[String, Any]`,
  * `Seq[Any]`, `String`, `Long`/`Double`, `Boolean`, `null`) —
  * pure-integer tokens land as exact `Long` (snapshot ids are
  * random 64-bit values), everything else numeric as `Double`;
  * callers read numbers through [[long]], malformed input flips `ok`
  * and never throws. Depth is capped at 64 so a crafted
  * `[[[[...` header cannot blow the stack — drop, never invent.
  */
private[graft] object JsonMini {

  private final val MaxDepth = 64

  /** Parse one JSON value requiring FULL input consumption
    * (trailing non-whitespace rejects). None on any malformation. */
  def parse(s: String): Option[Any] = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    if (p.ok && p.p == s.length) Some(v) else None
  }

  /** Parse one JSON value per line, skipping blank lines; None if
    * ANY line is malformed (a torn log line must fail the commit,
    * not silently drop an action). */
  def parseLines(text: String): Option[Seq[Any]] = {
    val out = Seq.newBuilder[Any]
    var i = 0
    val n = text.length
    while (i < n) {
      var j = text.indexOf('\n', i)
      if (j < 0) j = n
      val line = text.substring(i, j).trim
      if (line.nonEmpty) parse(line) match {
        case Some(v) => out += v
        case None => return None
      }
      i = j + 1
    }
    Some(out.result())
  }

  /** A string-keyed object field, typed. */
  def obj(v: Any): Option[Map[String, Any]] = v match {
    case m: Map[_, _] => Some(m.asInstanceOf[Map[String, Any]])
    case _ => None
  }

  def arr(v: Any): Option[Seq[Any]] = v match {
    case s: Seq[_] => Some(s.asInstanceOf[Seq[Any]])
    case _ => None
  }

  def str(v: Any): Option[String] = v match {
    case s: String => Some(s)
    case _ => None
  }

  /** A number field as an exact Long. Integer tokens parse as Long
    * directly (full 64-bit exactness — iceberg/delta snapshot ids
    * are random longs); Doubles (from fraction/exponent tokens or
    * caller defaults) are integral-checked and bounded STRICTLY
    * below 2^53 — at exactly 2^53 the value is ambiguous (2^53+1
    * parses to the same Double), and a tensor offset must never
    * round. */
  def long(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case d: Double
        if d == math.rint(d) && math.abs(d) < (1L << 53).toDouble =>
      Some(d.toLong)
    case _ => None
  }

  final class Parser(val s: String) {
    var p = 0
    var ok = true

    def skipWs(): Unit =
      while (p < s.length && s(p).isWhitespace) p += 1

    def value(): Any = value(0)

    private def value(depth: Int): Any = {
      if (depth > MaxDepth) { ok = false; return null }
      skipWs()
      if (p >= s.length) { ok = false; null }
      else s(p) match {
        case '{' =>
          p += 1; skipWs()
          val m = Map.newBuilder[String, Any]
          if (p < s.length && s(p) == '}') { p += 1 }
          else {
            var more = true
            while (more && ok) {
              val k = str(); skipWs()
              if (p >= s.length || s(p) != ':') ok = false
              else { p += 1; m += (k -> value(depth + 1)); skipWs()
                if (p < s.length && s(p) == ',') { p += 1; skipWs() }
                else if (p < s.length && s(p) == '}') { p += 1; more = false }
                else ok = false }
            }
          }
          m.result()
        case '[' =>
          p += 1; skipWs()
          val a = Seq.newBuilder[Any]
          if (p < s.length && s(p) == ']') { p += 1 }
          else {
            var more = true
            while (more && ok) {
              a += value(depth + 1); skipWs()
              if (p < s.length && s(p) == ',') { p += 1; skipWs() }
              else if (p < s.length && s(p) == ']') { p += 1; more = false }
              else ok = false
            }
          }
          a.result()
        case '"' => str()
        case 't' if s.startsWith("true", p) => p += 4; true
        case 'f' if s.startsWith("false", p) => p += 5; false
        case 'n' if s.startsWith("null", p) => p += 4; null
        case c if c == '-' || c.isDigit =>
          val st = p
          p += 1
          while (p < s.length && (s(p).isDigit || "+-.eE".contains(s(p))))
            p += 1
          val tok = s.substring(st, p)
          // pure-integer tokens keep 64-bit exactness (iceberg/
          // delta snapshot ids are random longs); everything else
          // (fractions, exponents, >64-bit) is a Double
          if (tok.forall(ch => ch.isDigit || ch == '-'))
            try java.lang.Long.parseLong(tok)
            catch {
              case _: NumberFormatException =>
                try java.lang.Double.parseDouble(tok)
                catch {
                  case _: NumberFormatException => ok = false; null
                }
            }
          else
            try java.lang.Double.parseDouble(tok)
            catch { case _: NumberFormatException => ok = false; null }
        case _ => ok = false; null
      }
    }

    private def str(): String = {
      skipWs()
      if (p >= s.length || s(p) != '"') { ok = false; return "" }
      p += 1
      val sb = new StringBuilder
      while (ok && p < s.length && s(p) != '"') {
        if (s(p) == '\\') {
          if (p + 1 >= s.length) ok = false
          else {
            s(p + 1) match {
              case '"' => sb += '"'; case '\\' => sb += '\\'
              case '/' => sb += '/'; case 'b' => sb += '\b'
              case 'f' => sb += '\f'; case 'n' => sb += '\n'
              case 'r' => sb += '\r'; case 't' => sb += '\t'
              case 'u' =>
                if (p + 5 >= s.length) ok = false
                else try {
                  sb += Integer.parseInt(s.substring(p + 2, p + 6), 16).toChar
                  p += 4
                } catch { case _: NumberFormatException => ok = false }
              case _ => ok = false
            }
            p += 2
          }
        } else { sb += s(p); p += 1 }
      }
      if (p >= s.length) ok = false else p += 1 // closing quote
      sb.toString
    }
  }

  /** Render a JSON string literal (the [[Avro]]/[[Safetensors]]
    * encoders' escape set: quote, backslash, C0 controls). */
  def quote(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb += '"'
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb += '"'
    sb.toString
  }
}
