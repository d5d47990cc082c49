package graft.operators

/** RSS 2.0 + Atom (RFC 4287) feed parse — the crawl frontier's
  * OTHER discovery input beside [[Sitemap]]: news/blog/podcast
  * pipelines ingest feeds to find fresh documents and media
  * enclosures. Same well-formed-subset scanner philosophy as the
  * sitemap walk (no XML library in this environment; the two
  * protocols' shapes are flat): case-sensitive tags, the five XML
  * entities + decimal/hex character references, CDATA passthrough,
  * attribute-aware tag scan (Atom `<link href=…>`, RSS
  * `<enclosure url=… length=… type=…>`), unknown children ignored.
  *
  * Timestamps normalize to epoch SECONDS from each format's wire
  * grammar — RFC 822/1123 dates in RSS `<pubDate>` (optional
  * day-of-week, 1-2 digit days, numeric and named zones via
  * java.time's RFC_1123 formatter) and RFC 3339 in Atom
  * `<updated>`/`<published>` (offsets, fractional seconds) —
  * −1 when absent/unparseable, never a guess.
  *
  * Entries without a guid/id fall back to the link (the common
  * aggregator dedup rule); an entry with neither drops. Feed kind
  * is detected from the root element (`<rss`/`<feed`), anything
  * else rejects. Pure string → rows, map-side at any scale.
  * Validation: FeedSpec (hand-pinned RSS and Atom documents,
  * date-grammar pins, entity/CDATA handling, enclosure attributes,
  * fallback/drop rules, fuzz) + the `feed_parse` gate query. */
object Feed {

  final case class Entry(title: String, link: String, id: String,
      epochS: Long, summary: String, enclosureUrl: String,
      enclosureType: String, enclosureBytes: Long,
      categories: Seq[String])

  final case class ParsedFeed(kind: String, title: String,
      entries: Seq[Entry])

  // ---------------------------------------------------------------
  // Scanner primitives (attribute-aware superset of Sitemap's)
  // ---------------------------------------------------------------

  private def decodeXml(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val sc = s.indexOf(';', i + 1)
        val ent = if (sc > i && sc - i <= 12) s.substring(i + 1, sc)
          else ""
        ent match {
          case "amp" => b.append('&'); i = sc + 1
          case "lt" => b.append('<'); i = sc + 1
          case "gt" => b.append('>'); i = sc + 1
          case "quot" => b.append('"'); i = sc + 1
          case "apos" => b.append('\''); i = sc + 1
          case e if e.startsWith("#x") || e.startsWith("#X") =>
            try { b.appendCodePoint(Integer.parseInt(e.drop(2), 16))
              i = sc + 1 }
            catch { case _: Exception => b.append(c); i += 1 }
          case e if e.startsWith("#") =>
            try { b.appendCodePoint(Integer.parseInt(e.drop(1)))
              i = sc + 1 }
            catch { case _: Exception => b.append(c); i += 1 }
          case _ => b.append(c); i += 1
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private def cdata(raw: String): String = {
    val t = raw.trim
    if (t.startsWith("<![CDATA[") && t.endsWith("]]>"))
      t.substring(9, t.length - 3)
    else decodeXml(t)
  }

  /** Start position + end of the opening tag for the FIRST
    * occurrence of `tag` (with or without attributes) at/after
    * `from`; (-1,-1) if absent. */
  private def findTag(block: String, tag: String, from: Int)
      : (Int, Int) = {
    var i = from
    while (i >= 0) {
      i = block.indexOf(s"<$tag", i)
      if (i < 0) return (-1, -1)
      val after = i + tag.length + 1
      if (after < block.length &&
        (block.charAt(after) == '>' || block.charAt(after) == ' ' ||
          block.charAt(after) == '/' || block.charAt(after) == '\t' ||
          block.charAt(after) == '\n')) {
        val close = block.indexOf('>', after)
        if (close < 0) return (-1, -1)
        return (i, close)
      }
      i = after
    }
    (-1, -1)
  }

  /** Text content of the first `<tag …>…</tag>`; "" if absent,
    * self-closing, or unclosed. */
  private def childText(block: String, tag: String): String = {
    val (open, openEnd) = findTag(block, tag, 0)
    if (open < 0) return ""
    if (block.charAt(openEnd - 1) == '/') return "" // self-closing
    val close = block.indexOf(s"</$tag>", openEnd + 1)
    if (close < 0) return ""
    cdata(block.substring(openEnd + 1, close))
  }

  /** Attribute value on the first `<tag …>` whose attributes
    * satisfy `accept`; "" if none. */
  private def attrOf(block: String, tag: String, attr: String,
      accept: Map[String, String] => Boolean): String = {
    var from = 0
    while (true) {
      val (open, openEnd) = findTag(block, tag, from)
      if (open < 0) return ""
      val attrs = parseAttrs(block.substring(open + tag.length + 1,
        openEnd))
      if (accept(attrs)) return attrs.getOrElse(attr, "")
      from = openEnd + 1
    }
    ""
  }

  private def parseAttrs(s: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    while (i < s.length) {
      while (i < s.length && !s.charAt(i).isLetter) i += 1
      val ns = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit ||
        s.charAt(i) == ':' || s.charAt(i) == '-' ||
        s.charAt(i) == '_')) i += 1
      val name = s.substring(ns, i)
      while (i < s.length && s.charAt(i) == ' ') i += 1
      if (name.nonEmpty && i < s.length && s.charAt(i) == '=') {
        i += 1
        while (i < s.length && s.charAt(i) == ' ') i += 1
        if (i < s.length && (s.charAt(i) == '"' ||
          s.charAt(i) == '\'')) {
          val q = s.charAt(i)
          i += 1
          val vs = i
          while (i < s.length && s.charAt(i) != q) i += 1
          if (i < s.length) {
            out += (name -> decodeXml(s.substring(vs, i)))
            i += 1
          }
        }
      }
    }
    out.result()
  }

  /** All `<tag …>…</tag>` inner blocks, non-nested scan. */
  private def blocks(xml: String, tag: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var from = 0
    var more = true
    while (more) {
      val (open, openEnd) = findTag(xml, tag, from)
      if (open < 0) more = false
      else {
        val close = xml.indexOf(s"</$tag>", openEnd + 1)
        if (close < 0) more = false
        else {
          out += xml.substring(openEnd + 1, close)
          from = close + tag.length + 3
        }
      }
    }
    out.result()
  }

  // ---------------------------------------------------------------
  // Dates
  // ---------------------------------------------------------------

  /** RFC 822/1123 (RSS) → epoch seconds; −1 on failure. */
  def parseRfc822(s: String): Long =
    try java.time.ZonedDateTime.parse(s.trim,
      java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
      .toEpochSecond
    catch { case _: Exception => -1L }

  /** RFC 3339 (Atom) → epoch seconds; −1 on failure. */
  def parseRfc3339(s: String): Long =
    try java.time.OffsetDateTime.parse(s.trim).toEpochSecond
    catch { case _: Exception => -1L }

  // ---------------------------------------------------------------
  // Parse
  // ---------------------------------------------------------------

  def parse(xml: String): Option[ParsedFeed] = {
    val (rssAt, _) = findTag(xml, "rss", 0)
    val (feedAt, _) = findTag(xml, "feed", 0)
    if (rssAt >= 0 && (feedAt < 0 || rssAt < feedAt)) {
      val channel = blocks(xml, "channel").headOption
        .getOrElse(return None)
      val feedTitle = childText(channel, "title")
      val entries = blocks(channel, "item").flatMap { it =>
        val link = childText(it, "link")
        val guid = childText(it, "guid") match {
          case "" => link
          case g => g
        }
        if (guid.isEmpty) None
        else Some(Entry(
          childText(it, "title"), link, guid,
          parseRfc822(childText(it, "pubDate")),
          childText(it, "description"),
          attrOf(it, "enclosure", "url", _ => true),
          attrOf(it, "enclosure", "type", _ => true),
          attrOf(it, "enclosure", "length", _ => true) match {
            case "" => -1L
            case n => try n.toLong catch {
              case _: NumberFormatException => -1L }
          },
          blocks(it, "category").map(cdata)))
      }
      Some(ParsedFeed("rss", feedTitle, entries))
    } else if (feedAt >= 0) {
      // feed title = first <title> OUTSIDE entries: scan the head
      val feedTitle = {
        val (e0, _) = findTag(xml, "entry", 0)
        val head = if (e0 < 0) xml else xml.substring(0, e0)
        childText(head, "title")
      }
      val entries = blocks(xml, "entry").flatMap { it =>
        // Atom: prefer rel="alternate" (or no rel), else first link
        val link = attrOf(it, "link", "href",
          a => a.get("rel").forall(_ == "alternate")) match {
          case "" => attrOf(it, "link", "href", _ => true)
          case l => l
        }
        val id = childText(it, "id") match {
          case "" => link
          case g => g
        }
        if (id.isEmpty) None
        else {
          val when = childText(it, "published") match {
            case "" => childText(it, "updated")
            case p => p
          }
          Some(Entry(
            childText(it, "title"), link, id,
            parseRfc3339(when),
            childText(it, "summary") match {
              case "" => childText(it, "content")
              case t => t
            },
            attrOf(it, "link", "href",
              a => a.get("rel").contains("enclosure")),
            attrOf(it, "link", "type",
              a => a.get("rel").contains("enclosure")),
            attrOf(it, "link", "length",
              a => a.get("rel").contains("enclosure")) match {
              case "" => -1L
              case n => try n.toLong catch {
                case _: NumberFormatException => -1L }
            },
            { // Atom categories are term= attributes
              val cats = Seq.newBuilder[String]
              var from = 0
              var more = true
              while (more) {
                val (o, e) = findTag(it, "category", from)
                if (o < 0) more = false
                else {
                  val a = parseAttrs(
                    it.substring(o + "category".length + 1, e))
                  a.get("term").foreach(cats += _)
                  from = e + 1
                }
              }
              cats.result()
            }))
        }
      }
      Some(ParsedFeed("atom", feedTitle, entries))
    } else None
  }
}
