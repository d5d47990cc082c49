package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization: RFC 3986 §6 normalization, dot-segment edge
  * cases, escape semantics, query sorting/tracking-param dropping,
  * and the host dedup key. */
class UrlNormSpec extends AnyFunSuite {
  import UrlNorm.{hostKey, normalize}

  test("scheme/host lowercase; default ports drop, others keep") {
    assert(normalize("HTTP://EXAMPLE.COM/Path") ==
      "http://example.com/Path")
    assert(normalize("http://example.com:80/a") == "http://example.com/a")
    assert(normalize("https://example.com:443/a") ==
      "https://example.com/a")
    assert(normalize("http://example.com:8080/a") ==
      "http://example.com:8080/a")
    assert(normalize("https://example.com:80/a") ==
      "https://example.com:80/a") // 80 is not https' default
    // path case is PRESERVED — only scheme+host fold
    assert(normalize("http://Ex.Com/CaseKept") == "http://ex.com/CaseKept")
  }

  test("empty path becomes /; fragment drops") {
    assert(normalize("http://a.com") == "http://a.com/")
    assert(normalize("http://a.com#frag") == "http://a.com/")
    assert(normalize("http://a.com/p#frag?notquery") == "http://a.com/p")
  }

  test("dot-segments remove per RFC 3986 §5.2.4") {
    assert(normalize("http://a.com/a/./b/../c") == "http://a.com/a/c")
    assert(normalize("http://a.com/a/../../b") == "http://a.com/b")
    assert(normalize("http://a.com/a/b/..") == "http://a.com/a/")
    assert(normalize("http://a.com/a/b/.") == "http://a.com/a/b/")
    assert(normalize("http://a.com/..") == "http://a.com/")
  }

  test("escapes: unreserved decode, reserved keep uppercase hex") {
    assert(normalize("http://a.com/p%61th") == "http://a.com/path")
    assert(normalize("http://a.com/a%2Fb") == "http://a.com/a%2Fb")
    assert(normalize("http://a.com/a%2fb") == "http://a.com/a%2Fb")
    assert(normalize("http://a.com/%7Euser") == "http://a.com/~user")
    // malformed escape survives untouched
    assert(normalize("http://a.com/100%") == "http://a.com/100%")
    assert(normalize("http://a.com/a%G1b") == "http://a.com/a%G1b")
  }

  test("query: params sort stably, tracking params drop") {
    assert(normalize("http://a.com/p?b=2&a=1") == "http://a.com/p?a=1&b=2")
    assert(normalize("http://a.com/p?utm_source=x&a=1&fbclid=y&gclid=z") ==
      "http://a.com/p?a=1")
    assert(normalize("http://a.com/p?utm_only=x") == "http://a.com/p")
    assert(normalize("http://a.com/p?a=2&a=1") == "http://a.com/p?a=2&a=1")
    assert(normalize("http://a.com/p?flag&a=1") == "http://a.com/p?a=1&flag")
    assert(normalize("http://a.com/p?") == "http://a.com/p")
  }

  test("non-absolute references only escape-normalize") {
    assert(normalize("/relative/p%61th") == "/relative/path")
    assert(normalize("mailto:x") == "mailto:x")
  }

  test("hostKey: registered-domain-ish last two labels, port stripped") {
    assert(hostKey("HTTP://WWW.News.Example.COM:8080/x") == "example.com")
    assert(hostKey("http://example.com/x") == "example.com")
    assert(hostKey("http://localhost/x") == "localhost")
    assert(hostKey("not a url") == "")
  }

  test("surtKey: reversed labels, kept port, full lowercase, sorts by domain") {
    assert(UrlNorm.surtKey("HTTP://WWW.Example.COM/A/b?Z=1") ==
      "com,example,www)/a/b?z=1")
    assert(UrlNorm.surtKey("http://a.b.c.d:8080/p") == "d,c,b,a:8080)/p")
    assert(UrlNorm.surtKey("http://ex.com:80/") == "com,ex)/") // :80 dropped
    assert(UrlNorm.surtKey("not a url") == "")
    // the ordering property: one domain's pages cluster contiguously
    val keys = Seq("http://www.ex3.com/z", "http://ex4.com/a",
      "http://ex3.com/a", "http://www.ex3.com/a").map(UrlNorm.surtKey)
    assert(keys.sorted == Seq("com,ex3)/a", "com,ex3,www)/a",
      "com,ex3,www)/z", "com,ex4)/a"))
  }
}
