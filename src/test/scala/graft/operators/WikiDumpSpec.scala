package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MediaWiki dump pins: round trips through the schema-shaped
  * writer (plain XML and the multistream bz2 layout), entity and
  * charref corners, redirects and namespaces, torn-page rejection,
  * fuzz. */
class WikiDumpSpec extends AnyFunSuite {

  private def pages(n: Int): Seq[WikiDump.Page] =
    (0 until n).map { i =>
      WikiDump.Page(i.toLong * 7, s"Page $i <&\"'>", i % 3,
        if (i % 5 == 2) Some(s"Target & $i") else None,
        s"Body of $i with <markup> & entities é中 " +
          ("x" * (i % 40)))
    }

  test("round trip: pages -> xml -> pages") {
    val ps = pages(40)
    val back = WikiDump.parsePages(WikiDump.buildXml(ps))
    assert(back.contains(ps))
  }

  test("round trip: multistream bz2 (several BZh streams)") {
    val ps = pages(30)
    val blob = WikiDump.buildMultistream(ps, groupPages = 7)
    // really multistream: more than one BZh magic
    val magics = blob.sliding(3).count(w =>
      w(0) == 'B' && w(1) == 'Z' && w(2) == 'h')
    assert(magics >= 5)
    assert(WikiDump.parseBz2(blob).contains(ps))
  }

  test("entities and charrefs decode; bad entities reject") {
    val xml = WikiDump.buildXml(Seq(WikiDump.Page(1, "T", 0, None,
      "plain")))
      .replace("plain", "a&lt;b&amp;c&#65;&#x42;")
    val got = WikiDump.parsePages(xml).get.head.text
    assert(got == "a<b&cAB")
    val bad = xml.replace("&lt;", "&bogus;")
    assert(WikiDump.parsePages(bad).isEmpty)
    val badRef = xml.replace("&lt;", "&#xD800;") // surrogate
    assert(WikiDump.parsePages(badRef).isEmpty)
  }

  test("redirect namespaces and first-id rule") {
    val ps = Seq(
      WikiDump.Page(42, "R", 4, Some("Elsewhere"), "#REDIRECT"),
      WikiDump.Page(43, "S", 0, None, "t"))
    val xml = WikiDump.buildXml(ps)
    val back = WikiDump.parsePages(xml).get
    assert(back == ps)
    // the revision's own <id> (id*10+1) must NOT become the page id
    assert(back.head.id == 42 && xml.contains("<id>421</id>"))
  }

  test("torn pages and malformed structure reject") {
    val good = WikiDump.buildXml(pages(3))
    assert(WikiDump.parsePages(good).isDefined)
    assert(WikiDump.parsePages(
      good.replace("</page>", "</pag_")).isEmpty)
    assert(WikiDump.parsePages(
      good.replaceFirst("<ns>[0-9]+</ns>", "<ns>x</ns>")).isEmpty)
    assert(WikiDump.parsePages(
      good.replaceFirst("<title>", "<nope>")).isEmpty)
    // bz2 garbage rejects through the codec
    assert(WikiDump.parseBz2("not bz2".getBytes).isEmpty)
  }

  test("fuzz: mutated xml never throws") {
    val xml = WikiDump.buildXml(pages(6))
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 400) {
      val chars = xml.toCharArray
      val i = rnd.nextInt(chars.length)
      chars(i) = (rnd.nextInt(94) + 33).toChar
      WikiDump.parsePages(new String(chars)): Unit
    }
  }
}
