package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** WebVTT pins: round trip, hours-optional timestamps, cue ids and
  * settings, NOTE/STYLE/REGION skipping, BOM tolerance, signature
  * enforcement, malformed-block skipping, CRLF files. */
class WebVttSpec extends AnyFunSuite {

  test("build → parse round trip") {
    val cues = Seq(
      ("", 0L, 1500L, "", "Hello there."),
      ("intro", 1500L, 3750L, "align:start position:10%",
        "Two\nlines here"),
      ("", 3600000L + 62000L, 3600000L + 65999L, "", "Past the hour"))
    val doc = WebVtt.build(cues)
    assert(doc.startsWith("WEBVTT\n\n"))
    val got = WebVtt.parse(doc).get
    assert(got.map(c => (c.id, c.startMs, c.endMs, c.settings, c.text)) ==
      cues)
  }

  test("hours are optional on parse") {
    val doc = "WEBVTT\n\n00:05.000 --> 00:07.250\nshort form\n"
    val got = WebVtt.parse(doc).get
    assert(got == Seq(WebVtt.VttCue("", 5000L, 7250L, "", "short form")))
  }

  test("NOTE, STYLE and REGION blocks are skipped; BOM tolerated") {
    val doc = "﻿WEBVTT - a title\n\n" +
      "NOTE this is\na comment\n\n" +
      "STYLE\n::cue { color: red }\n\n" +
      "REGION\nid:r1\n\n" +
      "1\n00:00:01.000 --> 00:00:02.000\ncue one\n"
    val got = WebVtt.parse(doc).get
    assert(got == Seq(WebVtt.VttCue("1", 1000L, 2000L, "", "cue one")))
  }

  test("missing signature rejects; malformed blocks skip") {
    assert(WebVtt.parse("1\n00:00:01.000 --> 00:00:02.000\nx\n").isEmpty)
    assert(WebVtt.parse("WEBVTTx\n\n").isEmpty) // bad signature line
    val doc = "WEBVTT\n\n" +
      "bad\nnot a time line\ntext\n\n" +           // malformed: skipped
      "00:00:70.000 --> 00:01:00.000\nbad secs\n\n" + // 70 s: skipped
      "00:00:05.000 --> 00:00:04.000\nbackwards\n\n" + // skipped
      "ok\n00:00:01.000 --> 00:00:02.000 line:0\nkept\n"
    val got = WebVtt.parse(doc).get
    assert(got == Seq(WebVtt.VttCue("ok", 1000L, 2000L, "line:0", "kept")))
  }

  test("CRLF documents parse identically") {
    val lf = "WEBVTT\n\na\n00:00:01.000 --> 00:00:02.000\nx\ny\n"
    val crlf = lf.replace("\n", "\r\n")
    assert(WebVtt.parse(crlf) == WebVtt.parse(lf))
  }

  test("fuzz never throws") {
    val rnd = new scala.util.Random(0x77)
    for (_ <- 0 until 1000) {
      val junk = (0 until rnd.nextInt(12)).map(_ =>
        rnd.alphanumeric.take(rnd.nextInt(20)).mkString)
        .mkString("\n")
      WebVtt.parse(junk)
      WebVtt.parse("WEBVTT\n\n" + junk)
    }
  }
}
