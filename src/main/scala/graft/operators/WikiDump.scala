package graft.operators

/** MediaWiki XML dumps (the PUBLIC export format,
  * www.mediawiki.org/xml/export-0.11 — what dumps.wikimedia.org
  * publishes) — one of the canonical large text-corpus sources: the
  * `pages-articles-multistream.xml.bz2` layout is CONCATENATED bz2
  * streams (each holding ~100 `<page>` elements), which
  * [[Bzip2.decode]] already walks, over a flat XML page grammar.
  *
  * Parse ([[parsePages]]): a strict scanner for the subset the
  * export schema actually emits per page —
  * {{{
  *   <page>
  *     <title>…</title> <ns>0</ns> <id>123</id>
  *     [<redirect title="…"/>]
  *     <revision> … <id>…</id> …
  *       <text bytes="…" [xml:space="preserve"]>wikitext</text>
  *     </revision>
  *   </page>
  * }}}
  * Title/text decode the five XML entities plus decimal/hex
  * charrefs; the page id is the FIRST `<id>` (the revision carries
  * its own); a missing title/id/ns or torn nesting drops the parse
  * (None — never invent). Text extraction is the raw wikitext;
  * markup stripping is a separate (heuristic) concern this operator
  * deliberately does not fold in.
  *
  * Build ([[buildXml]] / [[buildMultistream]]): the fixture path —
  * a schema-shaped dump document, and the multistream form as
  * per-group bz2 streams concatenated (our own encoder), exactly
  * the on-disk layout the real dumps use.
  *
  * Bomb caps: 2^20 pages, 2^26 text bytes. Scale: one dump shard =
  * one flatMap decode like every other archive walk here (real
  * multistream dumps split at stream boundaries via the companion
  * index file — the offsets land on the `BZh` magics this codec
  * resynchronizes at). Validation: WikiDumpSpec (round trips,
  * entity corners, redirect/ns forms, torn-page rejection, fuzz)
  * and the `wikidump_parse` gate row whose facts the DuckDB oracle
  * recomputes from documents. */
object WikiDump {

  final case class Page(id: Long, title: String, ns: Int,
      redirect: Option[String], text: String)

  private final val MaxPages = 1 << 20
  private final val MaxText = 1 << 26

  // ---------------------------------------------------------------
  // XML helpers (the export subset: no DTDs, no PIs beyond the
  // declaration, no nested same-name elements within a page)
  // ---------------------------------------------------------------

  private def unescape(s: String): Option[String] = {
    if (!s.contains('&')) return Some(s)
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 12) return None
        val ent = s.substring(i + 1, semi)
        ent match {
          case "lt" => out.append('<')
          case "gt" => out.append('>')
          case "amp" => out.append('&')
          case "quot" => out.append('"')
          case "apos" => out.append('\'')
          case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
            val cp = try Integer.parseInt(ent.substring(2), 16)
              catch { case _: NumberFormatException => return None }
            if (cp < 0 || cp > 0x10ffff ||
              (cp >= 0xd800 && cp <= 0xdfff)) return None
            out.appendCodePoint(cp)
          case _ if ent.startsWith("#") =>
            val cp = try Integer.parseInt(ent.substring(1))
              catch { case _: NumberFormatException => return None }
            if (cp < 0 || cp > 0x10ffff ||
              (cp >= 0xd800 && cp <= 0xdfff)) return None
            out.appendCodePoint(cp)
          case _ => return None
        }
        i = semi + 1
      }
    }
    Some(out.toString)
  }

  private def escape(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    s.foreach {
      case '<' => out.append("&lt;")
      case '>' => out.append("&gt;")
      case '&' => out.append("&amp;")
      case '"' => out.append("&quot;")
      case c => out.append(c)
    }
    out.toString
  }

  /** First <tag …>body</tag> inside [from, limit); returns
    * (decodedBody, posAfterClose). The body must not contain a
    * nested same-name element (true for the export subset). */
  private def element(xml: String, tag: String, from: Int,
      limit: Int): Option[(String, Int)] = {
    val open = xml.indexOf(s"<$tag", from)
    if (open < 0 || open >= limit) return None
    val gt = xml.indexOf('>', open)
    if (gt < 0 || gt >= limit) return None
    // self-closing or attribute-carrying opens both end at '>'
    if (xml.charAt(gt - 1) == '/') return Some(("", gt + 1))
    val close = xml.indexOf(s"</$tag>", gt + 1)
    if (close < 0 || close + tag.length + 3 > limit) return None
    unescape(xml.substring(gt + 1, close))
      .map(b => (b, close + tag.length + 3))
  }

  // ---------------------------------------------------------------
  // Parse
  // ---------------------------------------------------------------

  /** All pages of one dump XML document; None on any malformation. */
  def parsePages(xml: String): Option[Seq[Page]] = {
    if (xml.length > MaxText) return None
    val out = Seq.newBuilder[Page]
    var p = 0
    var n = 0
    while ({ p = xml.indexOf("<page>", p); p >= 0 }) {
      n += 1
      if (n > MaxPages) return None
      val end = xml.indexOf("</page>", p)
      if (end < 0) return None
      val limit = end
      val (title, _) = element(xml, "title", p, limit)
        .getOrElse(return None)
      val (nsS, nsEnd) = element(xml, "ns", p, limit)
        .getOrElse(return None)
      val ns = try nsS.trim.toInt
        catch { case _: NumberFormatException => return None }
      val (idS, _) = element(xml, "id", nsEnd, limit)
        .getOrElse(return None)
      val id = try idS.trim.toLong
        catch { case _: NumberFormatException => return None }
      // <redirect title="…"/> appears before <revision> when present
      val redirect: Option[String] = {
        val r = xml.indexOf("<redirect", p)
        val rev = xml.indexOf("<revision", p)
        if (r >= 0 && r < limit && (rev < 0 || r < rev)) {
          val ti = xml.indexOf("title=\"", r)
          val gt = xml.indexOf('>', r)
          if (ti < 0 || gt < 0 || ti > gt) return None
          val tq = xml.indexOf('"', ti + 7)
          if (tq < 0 || tq > gt) return None
          Some(unescape(xml.substring(ti + 7, tq))
            .getOrElse(return None))
        } else None
      }
      val rev = xml.indexOf("<revision", p)
      if (rev < 0 || rev >= limit) return None
      val (text, _) = element(xml, "text", rev, limit)
        .getOrElse(return None)
      out += Page(id, title, ns, redirect, text)
      p = end + 7
    }
    Some(out.result())
  }

  /** Parse a (possibly multistream) `.xml.bz2` dump blob. */
  def parseBz2(data: Array[Byte]): Option[Seq[Page]] =
    Bzip2.decode(data, MaxText)
      .flatMap(b => parsePages(new String(b, "UTF-8")))

  // ---------------------------------------------------------------
  // Build (fixtures)
  // ---------------------------------------------------------------

  /** A schema-shaped dump document for `pages`. */
  def buildXml(pages: Seq[Page]): String = {
    val sb = new java.lang.StringBuilder
    sb.append("<mediawiki xmlns=\"http://www.mediawiki.org/xml/")
      .append("export-0.11/\" version=\"0.11\" xml:lang=\"en\">\n")
    sb.append("  <siteinfo><sitename>graft</sitename>")
      .append("<dbname>graftwiki</dbname></siteinfo>\n")
    pages.foreach { pg =>
      sb.append("  <page>\n")
      sb.append(s"    <title>${escape(pg.title)}</title>\n")
      sb.append(s"    <ns>${pg.ns}</ns>\n")
      sb.append(s"    <id>${pg.id}</id>\n")
      pg.redirect.foreach(r =>
        sb.append(s"""    <redirect title="${escape(r)}"/>\n"""))
      sb.append("    <revision>\n")
      sb.append(s"      <id>${pg.id * 10 + 1}</id>\n")
      sb.append("      <timestamp>2024-01-01T00:00:00Z</timestamp>\n")
      val bytes = pg.text.getBytes("UTF-8").length
      sb.append(s"""      <text bytes="$bytes" """)
        .append(s"""xml:space="preserve">${escape(pg.text)}</text>\n""")
      sb.append("    </revision>\n")
      sb.append("  </page>\n")
    }
    sb.append("</mediawiki>\n")
    sb.toString
  }

  /** The multistream layout: `groupPages` pages per bz2 stream,
    * streams concatenated. NOTE each stream of a real multistream
    * dump carries bare `<page>` runs (the envelope lives in stream
    * 0 of the full dump); for self-contained fixtures every stream
    * here is a complete document, which the parser accepts the
    * same way. */
  def buildMultistream(pages: Seq[Page], groupPages: Int)
      : Array[Byte] = {
    require(groupPages > 0)
    val out = new java.io.ByteArrayOutputStream()
    pages.grouped(groupPages).foreach { g =>
      val b = Bzip2.encode(buildXml(g).getBytes("UTF-8"))
      out.write(b, 0, b.length)
    }
    out.toByteArray
  }
}
