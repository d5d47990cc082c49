package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 evaluation pins: group selection, most-specific-wins,
  * wildcard/anchor matching, and the parser's comment/stacking/empty
  * rules. */
class RobotsSpec extends AnyFunSuite {

  private val txt =
    """# policy
      |User-agent: alpha
      |User-agent: beta
      |Disallow: /a
      |Allow: /a/b
      |
      |User-agent: *
      |Disallow: /x*y$
      |Disallow:
      |Crawl-delay: 10
      |""".stripMargin

  private val g = Robots.parse(txt)

  test("parser: stacked agents, comments, empty Disallow, unknown fields") {
    assert(g.size == 2)
    assert(g.head.agents == Seq("alpha", "beta"))
    assert(g.head.rules == Seq(Robots.Rule(false, "/a"),
      Robots.Rule(true, "/a/b")))
    assert(g(1).rules == Seq(Robots.Rule(false, "/x*y$")))
  }

  test("group selection: matching token shadows '*', fallback otherwise") {
    // beta picks the first group: /a blocked, /a/b re-allowed
    assert(!Robots.allowed(g, "BetaBot/2.0", "/a/c"))
    assert(Robots.allowed(g, "BetaBot/2.0", "/a/b/c"))
    // and the '*' rules do NOT apply to it
    assert(Robots.allowed(g, "BetaBot/2.0", "/xzzy"))
    // unknown agent falls back to '*'
    assert(!Robots.allowed(g, "crawler", "/xzzy"))
    assert(Robots.allowed(g, "crawler", "/a/c"))
  }

  test("only the longest-token matching group applies (RFC 9309 §2.2.1)") {
    val layered = Robots.parse(
      """User-agent: graft
        |Disallow: /short
        |
        |User-agent: graftbot
        |Disallow: /long
        |
        |User-agent: *
        |Disallow: /star
        |""".stripMargin)
    // a graftbot agent matches BOTH tokens; only the longer
    // ('graftbot') group may apply — the 'graft' group's rules must not
    assert(Robots.allowed(layered, "GraftBot/1.0", "/short"))
    assert(!Robots.allowed(layered, "GraftBot/1.0", "/long"))
    assert(Robots.allowed(layered, "GraftBot/1.0", "/star"))
    // an agent matching only the shorter token gets that group
    assert(!Robots.allowed(layered, "graft-indexer", "/short"))
    assert(Robots.allowed(layered, "graft-indexer", "/long"))
    // equal-length token groups combine
    val twin = Robots.parse(
      "User-agent: bot\nDisallow: /a\n\nUser-agent: bot\nDisallow: /b\n")
    assert(!Robots.allowed(twin, "mybot", "/a"))
    assert(!Robots.allowed(twin, "mybot", "/b"))
  }

  test("wildcard and anchor matching") {
    assert(Robots.matches("/x*y$", "/xy"))
    assert(Robots.matches("/x*y$", "/x123y"))
    assert(!Robots.matches("/x*y$", "/x123y/z")) // anchored
    assert(Robots.matches("/x*y", "/x123y/z"))   // unanchored prefix
    assert(Robots.matches("/a*b*c", "/a1b2c3"))
    assert(!Robots.matches("/a*b*c", "/a1c2b3"))
    assert(Robots.matches("/p$", "/p"))
    assert(!Robots.matches("/p$", "/pq"))
    assert(Robots.matches("/*", "/anything"))
  }

  test("most-specific-wins; Allow beats Disallow at equal length") {
    val tie = Robots.parse(
      "User-agent: *\nDisallow: /abc\nAllow: /ab*\n")
    // equal pattern length 4 → Allow wins
    assert(Robots.allowed(tie, "bot", "/abcd"))
    val longer = Robots.parse(
      "User-agent: *\nAllow: /ab\nDisallow: /abcd\n")
    assert(!Robots.allowed(longer, "bot", "/abcde"))
    assert(Robots.allowed(longer, "bot", "/abX"))
    // no matching rule → allowed
    assert(Robots.allowed(longer, "bot", "/zzz"))
  }
}
