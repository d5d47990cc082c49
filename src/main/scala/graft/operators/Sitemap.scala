package graft.operators

/** Sitemap protocol (sitemaps.org) parse — the discovery-side
  * complement of robots.txt: `<urlset>` entries with loc / lastmod /
  * changefreq / priority, and `<sitemapindex>` files pointing at child
  * sitemaps. A lightweight well-formed-subset scanner (no XML library
  * in this environment, none needed for the protocol's flat shape):
  * tags are matched case-sensitively per the spec, text content
  * decodes the five XML entities, CDATA sections pass through
  * verbatim, unknown child tags are ignored, and an entry without a
  * `<loc>` is dropped (the spec makes loc mandatory). Pure string →
  * rows; a map-side parse at any scale. */
object Sitemap {

  final case class SitemapUrl(loc: String, lastmod: String,
      changefreq: String, priorityPpm: Long)

  private def decodeXml(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val sc = s.indexOf(';', i + 1)
        val ent = if (sc > i) s.substring(i + 1, sc) else ""
        ent match {
          case "amp" => b.append('&'); i = sc + 1
          case "lt" => b.append('<'); i = sc + 1
          case "gt" => b.append('>'); i = sc + 1
          case "quot" => b.append('"'); i = sc + 1
          case "apos" => b.append('\''); i = sc + 1
          case _ => b.append(c); i += 1 // malformed: literal '&'
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Text content of the FIRST `<tag>...</tag>` inside `block`, XML
    * entities decoded, CDATA honored; empty string if absent or
    * unclosed. */
  private def childText(block: String, tag: String): String = {
    val open = block.indexOf(s"<$tag>")
    if (open < 0) return ""
    val from = open + tag.length + 2
    val close = block.indexOf(s"</$tag>", from)
    if (close < 0) return ""
    val raw = block.substring(from, close).trim
    if (raw.startsWith("<![CDATA[") && raw.endsWith("]]>"))
      raw.substring(9, raw.length - 3)
    else decodeXml(raw)
  }

  private def blocks(xml: String, tag: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    var ok = true
    while (ok) {
      val open = xml.indexOf(s"<$tag>", i)
      if (open < 0) ok = false
      else {
        val close = xml.indexOf(s"</$tag>", open)
        if (close < 0) ok = false // unclosed trailing entry: dropped
        else {
          out += xml.substring(open + tag.length + 2, close)
          i = close + tag.length + 3
        }
      }
    }
    out.result()
  }

  /** Priority "0.8" → 800000 ppm; absent/malformed → the spec default
    * 0.5 → 500000. Parsed with integer arithmetic (digits on either
    * side of the dot), so no float round-trip. */
  private def priorityPpm(s: String): Long = {
    if (s.isEmpty) return 500000L
    val dot = s.indexOf('.')
    val whole = if (dot < 0) s else s.substring(0, dot)
    val frac = if (dot < 0) "" else s.substring(dot + 1)
    if (!whole.forall(_.isDigit) || !frac.forall(_.isDigit) ||
      whole.isEmpty) return 500000L
    val f6 = (frac + "000000").take(6)
    whole.toLong * 1000000L + f6.toLong
  }

  def parseUrlset(xml: String): Seq[SitemapUrl] =
    blocks(xml, "url").flatMap { b =>
      val loc = childText(b, "loc")
      if (loc.isEmpty) None
      else Some(SitemapUrl(loc, childText(b, "lastmod"),
        childText(b, "changefreq"), priorityPpm(childText(b, "priority"))))
    }

  /** Child sitemap locations of a `<sitemapindex>`. */
  def parseIndex(xml: String): Seq[String] =
    blocks(xml, "sitemap").map(b => childText(b, "loc"))
      .filter(_.nonEmpty)
}
