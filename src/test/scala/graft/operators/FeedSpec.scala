package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Feed pins: a hand-written RSS 2.0 document (guid fallback,
  * enclosure attributes, RFC 822 dates incl. numeric and named
  * zones, categories, CDATA and entity text) and a hand-written
  * Atom document (rel link selection, published/updated fallback,
  * RFC 3339 dates with offsets and fractions, term categories),
  * drop rules, non-feeds rejecting, and fuzz. */
class FeedSpec extends AnyFunSuite {

  import Feed._

  private val rss =
    """<?xml version="1.0"?>
      |<rss version="2.0"><channel>
      |<title>My &amp; Feed</title>
      |<item>
      |  <title><![CDATA[Ep 1 <raw>]]></title>
      |  <link>https://ex.com/1</link>
      |  <guid>urn:ep1</guid>
      |  <pubDate>Tue, 10 Jun 2003 04:00:00 GMT</pubDate>
      |  <description>Hello &lt;world&gt; &#33;</description>
      |  <enclosure url="https://ex.com/1.mp3" length="123456"
      |    type="audio/mpeg"/>
      |  <category>news</category>
      |  <category><![CDATA[tech]]></category>
      |</item>
      |<item>
      |  <title>No guid</title>
      |  <link>https://ex.com/2</link>
      |  <pubDate>1 Jan 2021 00:00:00 +0230</pubDate>
      |</item>
      |<item><title>neither guid nor link drops</title></item>
      |</channel></rss>""".stripMargin

  private val atom =
    """<?xml version="1.0"?>
      |<feed xmlns="http://www.w3.org/2005/Atom">
      |<title>Atom Feed</title>
      |<entry>
      |  <title>Post A</title>
      |  <link rel="alternate" href="https://ex.com/a"/>
      |  <link rel="enclosure" href="https://ex.com/a.m4a"
      |    type="audio/mp4" length="777"/>
      |  <id>tag:a</id>
      |  <published>2003-12-13T18:30:02.25+01:00</published>
      |  <updated>2004-01-01T00:00:00Z</updated>
      |  <summary>Sum A</summary>
      |  <category term="alpha"/><category term="beta"/>
      |</entry>
      |<entry>
      |  <title>Post B</title>
      |  <link href="https://ex.com/b"/>
      |  <updated>2004-02-02T10:00:00Z</updated>
      |  <content>Body B</content>
      |</entry>
      |</feed>""".stripMargin

  test("RSS: items, guid fallback, enclosure, dates, categories") {
    val f = parse(rss).get
    assert(f.kind == "rss" && f.title == "My & Feed")
    assert(f.entries.length == 2) // the guid-and-link-less one drops
    val e1 = f.entries.head
    assert(e1.title == "Ep 1 <raw>")
    assert(e1.id == "urn:ep1" && e1.link == "https://ex.com/1")
    assert(e1.epochS == 1055217600L) // 2003-06-10T04:00:00Z
    assert(e1.summary == "Hello <world> !")
    assert(e1.enclosureUrl == "https://ex.com/1.mp3" &&
      e1.enclosureType == "audio/mpeg" &&
      e1.enclosureBytes == 123456L)
    assert(e1.categories == Seq("news", "tech"))
    val e2 = f.entries(1)
    assert(e2.id == "https://ex.com/2") // guid falls back to link
    // 2021-01-01T00:00:00+02:30 = 2020-12-31T21:30:00Z
    assert(e2.epochS == 1609450200L)
    assert(e2.enclosureUrl == "" && e2.enclosureBytes == -1L)
  }

  test("Atom: rel selection, date fallbacks, term categories") {
    val f = parse(atom).get
    assert(f.kind == "atom" && f.title == "Atom Feed")
    assert(f.entries.length == 2)
    val a = f.entries.head
    assert(a.link == "https://ex.com/a") // alternate, not enclosure
    assert(a.id == "tag:a")
    // published wins over updated; +01:00 with .25 fraction
    assert(a.epochS == 1071336602L) // 2003-12-13T17:30:02Z
    assert(a.summary == "Sum A")
    assert(a.enclosureUrl == "https://ex.com/a.m4a" &&
      a.enclosureType == "audio/mp4" && a.enclosureBytes == 777L)
    assert(a.categories == Seq("alpha", "beta"))
    val b = f.entries(1)
    assert(b.id == "https://ex.com/b") // id falls back to link
    assert(b.epochS == 1075716000L)    // updated when no published
    assert(b.summary == "Body B")      // content when no summary
  }

  test("date grammar corners") {
    assert(parseRfc822("Tue, 10 Jun 2003 04:00:00 GMT") ==
      1055217600L)
    assert(parseRfc822("10 Jun 2003 04:00:00 +0000") == 1055217600L)
    assert(parseRfc822("not a date") == -1L)
    assert(parseRfc3339("2003-12-13T18:30:02Z") == 1071340202L)
    assert(parseRfc3339("2003-12-13T18:30:02-05:00") == 1071358202L)
    assert(parseRfc3339("13 Jun 2003") == -1L)
  }

  test("non-feeds reject; fuzz never throws") {
    assert(parse("<html><body>hi</body></html>").isEmpty)
    assert(parse("").isEmpty)
    assert(parse("<rss><channel but broken").isEmpty)
    val rnd = new scala.util.Random(71)
    (0 until 300).foreach { _ =>
      val chars = "<>/abcdefgh \"'=&;![]CDATA"
      parse(Array.fill(rnd.nextInt(200))(
        chars(rnd.nextInt(chars.length))).mkString)
    }
    // mutated real feeds never throw
    (0 until 200).foreach { _ =>
      val base = if (rnd.nextBoolean()) rss else atom
      val i = rnd.nextInt(base.length)
      parse(base.substring(0, i) + base.substring(
        math.min(base.length, i + 1 + rnd.nextInt(5))))
    }
  }
}
