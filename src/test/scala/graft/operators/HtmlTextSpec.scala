package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** HTML → text state machine: raw-text elements, hostile attributes,
  * comments containing markup, entity forms, malformed tails, and the
  * escape/extract round trip. */
class HtmlTextSpec extends AnyFunSuite {
  import HtmlText.{escape, extractText}

  test("tags strip and become word boundaries") {
    assert(extractText("<p>a</p><p>b</p>") == "a b")
    assert(extractText("a<br/>b") == "a b")
    assert(extractText("<div><span>x</span>y</div>") == "x y")
    assert(extractText("  <p>  a  \n b  </p>  ") == "a b")
  }

  test("script and style drop with their content, case-insensitive") {
    assert(extractText("a<script>var x = '<p>leak</p>';</script>b") == "a b")
    assert(extractText("a<SCRIPT>if (1 < 2) { }</ScRiPt>b") == "a b")
    assert(extractText("a<style>p > span { color: red }</style>b") == "a b")
    // a close tag INSIDE a script string still ends nothing but script
    assert(extractText("""x<script>s = "</p>";</script>y""") == "x y")
    // unterminated script swallows the tail instead of leaking it
    assert(extractText("keep<script>var t = 1;") == "keep")
  }

  test("quoted attributes may contain '>' and quotes") {
    assert(extractText("""<a href="u?a>b" title='2 > 1'>link</a>""")
      == "link")
    assert(extractText("""<img alt="x'y">z""") == "z")
  }

  test("comments drop, even containing tags; unterminated eats tail") {
    assert(extractText("a<!-- <b>hidden</b> -->b") == "a b")
    assert(extractText("a<!-- no close") == "a")
  }

  test("entities: named, decimal, hex, unknown stays literal") {
    assert(extractText("&lt;tag&gt; &amp; &quot;q&quot; &apos;a&apos;")
      == "<tag> & \"q\" 'a'")
    assert(extractText("A&#66;C") == "ABC")
    assert(extractText("A&#x42;C") == "ABC")
    assert(extractText("a&nbsp;b") == "a b")
    assert(extractText("AT&T; R&D") == "AT&T; R&D")
    assert(extractText("x&#notanum;y") == "x&#notanum;y")
  }

  test("escape/extract round-trips arbitrary ASCII text") {
    val nasty = """a < b && c > d "quoted" 'single' </p> <script>"""
    assert(extractText("<p>" + escape(nasty) + "</p>")
      == nasty.replaceAll("\\s+", " ").trim)
    assert(extractText("<p>" + escape("tabs\t\tand\n\nnewlines") + "</p>")
      == "tabs and newlines")
  }

  test("malformed tag at end of input does not throw") {
    assert(extractText("text<div unclosed") == "text")
    assert(extractText("<") == "")
    assert(extractText("") == "")
  }
}
