package graft.operators

/** HTML → text extraction, the first step of every web-scraped training
  * corpus (the reference has no web path — this is north-star surface;
  * cf. the text-extraction stage in WET generation / C4 / RefinedWeb).
  *
  * A single-pass state machine, not a regex pile: script/style elements
  * drop with their CONTENT (a regex that strips tags would leak
  * JavaScript into the corpus), comments drop, tags become word
  * boundaries, character entities decode, and whitespace collapses to
  * the single-space convention. Pure JVM, zero allocation beyond the
  * builder — runs inside a mapPartitions pass, embarrassingly parallel
  * at 100 TB.
  */
object HtmlText {

  /** True for exactly the characters both Java's and RE2's `\s` match
    * in ASCII — keeps the JVM collapse and a SQL `\s+` regexp oracle
    * bit-identical. */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
      c == 0x0B

  /** Decode one entity starting at `i` (html(i) == '&'); returns the
    * decoded codepoint and the index AFTER the entity, or None when
    * the ampersand is literal. Named set: the five XML entities +
    * nbsp (decoded to a plain space — corpus convention); numeric:
    * decimal and hex forms. */
  private def entity(html: String, i: Int): Option[(Char, Int)] = {
    val semi = html.indexOf(';', i + 1)
    if (semi < 0 || semi > i + 10) return None
    val body = html.substring(i + 1, semi)
    val decoded: Option[Char] = body match {
      case "amp"  => Some('&')
      case "lt"   => Some('<')
      case "gt"   => Some('>')
      case "quot" => Some('"')
      case "apos" => Some('\'')
      case "nbsp" => Some(' ')
      case _ if body.length > 1 && body.charAt(0) == '#' =>
        val num = body.substring(1)
        val cp =
          if ((num.charAt(0) == 'x' || num.charAt(0) == 'X') &&
            num.length > 1 && num.length <= 7)
            try Some(Integer.parseInt(num.substring(1), 16))
            catch { case _: NumberFormatException => None }
          else if (num.forall(_.isDigit) && num.length <= 7)
            try Some(Integer.parseInt(num))
            catch { case _: NumberFormatException => None }
          else None
        cp.collect { case v if v >= 1 && v <= 0xFFFF => v.toChar }
      case _ => None
    }
    decoded.map((_, semi + 1))
  }

  /** Case-insensitive check that `html` has `what` at `i`. */
  private def has(html: String, i: Int, what: String): Boolean =
    html.regionMatches(true, i, what, 0, what.length)

  /** Skip a tag starting at `i` (html(i) == '<'): returns the index
    * after the closing '>', honoring quoted attribute values (a '>'
    * inside quotes does not close the tag). When no closer exists the
    * rest of the document is tag garbage — returns length. */
  private def skipTag(html: String, i: Int): Int = {
    var j = i + 1
    var quote: Char = 0
    while (j < html.length) {
      val c = html.charAt(j)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return j + 1
      j += 1
    }
    html.length
  }

  /** Skip a raw-text element (script/style) whose open tag starts at
    * `i`: returns the index after the matching case-insensitive close
    * tag, or length when unterminated. */
  private def skipRawText(html: String, i: Int, name: String): Int = {
    var j = skipTag(html, i) // past the open tag
    val close = "</" + name
    while (j < html.length) {
      if (html.charAt(j) == '<' && has(html, j, close))
        return skipTag(html, j)
      j += 1
    }
    html.length
  }

  /** Extract visible text: drop script/style content, comments and
    * tags (each a word boundary), decode entities, collapse runs of
    * whitespace to one space, trim. */
  def extractText(html: String): String = {
    val out = new java.lang.StringBuilder(html.length)
    var pendingWs = false
    def emit(c: Char): Unit = {
      if (isWs(c)) { if (out.length > 0) pendingWs = true }
      else {
        if (pendingWs) { out.append(' '); pendingWs = false }
        out.append(c)
      }
    }
    var i = 0
    while (i < html.length) {
      val c = html.charAt(i)
      if (c == '<') {
        if (has(html, i, "<!--")) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) html.length else end + 3
        } else if (has(html, i, "<script") || has(html, i, "<style")) {
          val name = if (has(html, i, "<script")) "script" else "style"
          i = skipRawText(html, i, name)
        } else i = skipTag(html, i)
        pendingWs = pendingWs || out.length > 0 // tag = word boundary
      } else if (c == '&') {
        entity(html, i) match {
          case Some((d, next)) => emit(d); i = next
          case None            => emit('&'); i += 1
        }
      } else { emit(c); i += 1 }
    }
    out.toString
  }

  /** Escape text for embedding in an HTML text node or double-quoted
    * attribute — the fixture-side inverse of the entity decoder. */
  def escape(t: String): String = {
    val b = new java.lang.StringBuilder(t.length)
    t.foreach {
      case '&' => b.append("&amp;")
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case '"' => b.append("&quot;")
      case c   => b.append(c)
    }
    b.toString
  }
}
