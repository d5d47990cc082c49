package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Sitemap scanner pins: entity decode, CDATA passthrough, defaults,
  * mandatory-loc drops, unclosed-entry drops, index files, and the
  * integer priority parse. */
class SitemapSpec extends AnyFunSuite {

  test("urlset: fields, entities, CDATA, defaults") {
    val xml =
      """<?xml version="1.0"?><urlset>
        |<url><loc>http://a.com/p?x=1&amp;y=&lt;2&gt;</loc>
        |  <lastmod>2026-02-01</lastmod><changefreq>weekly</changefreq>
        |  <priority>0.25</priority></url>
        |<url><loc><![CDATA[http://a.com/q?raw=&amp;]]></loc></url>
        |</urlset>""".stripMargin
    val us = Sitemap.parseUrlset(xml)
    assert(us.size == 2)
    assert(us.head == Sitemap.SitemapUrl("http://a.com/p?x=1&y=<2>",
      "2026-02-01", "weekly", 250000L))
    // CDATA passes through verbatim — no entity decode
    assert(us(1) == Sitemap.SitemapUrl("http://a.com/q?raw=&amp;",
      "", "", 500000L))
  }

  test("mandatory loc, unclosed entries, malformed priorities") {
    val xml =
      """<urlset>
        |<url><lastmod>2026-01-01</lastmod></url>
        |<url><loc>http://b.com/ok</loc><priority>high</priority></url>
        |<url><loc>http://b.com/torn</urlset>""".stripMargin
    val us = Sitemap.parseUrlset(xml)
    assert(us.size == 1) // no-loc dropped, torn tail dropped
    assert(us.head.loc == "http://b.com/ok")
    assert(us.head.priorityPpm == 500000L) // malformed → default
    assert(Sitemap.parseUrlset("") == Nil)
  }

  test("priority integer parse: 1.0, 0, trailing digits") {
    def p(s: String) = {
      val xml = s"<urlset><url><loc>x</loc><priority>$s</priority></url></urlset>"
      Sitemap.parseUrlset(xml).head.priorityPpm
    }
    assert(p("1.0") == 1000000L)
    assert(p("0") == 0L)
    assert(p("0.125") == 125000L)
    assert(p(".5") == 500000L) // no whole digits → malformed → default
  }

  test("sitemapindex: child locations") {
    val xml =
      """<sitemapindex>
        |<sitemap><loc>http://a.com/s1.xml</loc><lastmod>2026-01-01</lastmod></sitemap>
        |<sitemap><loc>http://a.com/s2.xml</loc></sitemap>
        |<sitemap></sitemap>
        |</sitemapindex>""".stripMargin
    assert(Sitemap.parseIndex(xml) ==
      Seq("http://a.com/s1.xml", "http://a.com/s2.xml"))
  }
}
