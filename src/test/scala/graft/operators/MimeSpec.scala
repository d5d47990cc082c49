package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MIME pins: full build→parse round trips (QP + base64 + multipart
  * + attachments), header folding and case-insensitivity, QP edge
  * cases (soft breaks, trailing space, bad escapes pass through),
  * nested multipart, unterminated multipart degradation, the mbox
  * spool walk with mboxrd From-escaping, and fuzz. */
class MimeSpec extends AnyFunSuite {

  test("multipart message round-trips every part") {
    val plain = "Body with spécial çhars,\nlines, trailing space \n" +
      "and = signs == everywhere, plus a long line " + ("x" * 200)
    val html = "<html><body><p>Html &amp; stuff</p></body></html>"
    val att = Array.tabulate[Byte](300)(i => (i * 7).toByte)
    val raw = Mime.buildMessage("a@b.c", "Subject line", plain, html,
      Seq(("blob.bin", att)), "BOUND42")
    val m = Mime.parseMessage(raw)
    assert(m.header("From").contains("a@b.c"))
    assert(m.header("subject").contains("Subject line")) // case-insens
    assert(m.parts.map(_.mediaType) ==
      Seq("text/plain", "text/html", "application/octet-stream"))
    assert(m.parts(0).text == plain)
    assert(m.parts(1).text == html)
    assert(m.parts(2).data.sameElements(att))
  }

  test("header folding joins continuation lines") {
    val raw = "Subject: part one\r\n part two\r\n\tpart three\r\n" +
      "X-Other: v\r\n\r\nbody"
    val m = Mime.parseMessage(raw)
    assert(m.header("Subject").contains("part one part two part three"))
    assert(m.parts.head.text == "body")
  }

  test("quoted-printable edges") {
    // RFC example: '=' encodes as =3D; soft breaks vanish
    assert(new String(Mime.qpDecode("a=3Db")) == "a=b")
    assert(new String(Mime.qpDecode("long=\r\nline")) == "longline")
    assert(new String(Mime.qpDecode("long=\nline")) == "longline")
    // bad escape passes through literally
    assert(new String(Mime.qpDecode("a=XYb")) == "a=XYb")
    // round trip with every byte class
    val data = (0 until 256).map(_.toByte).filter(_ != '\r').toArray
    assert(Mime.qpDecode(Mime.qpEncode(data)).sameElements(
      data.filter(_ != '\r')))
  }

  test("nested multipart recurses") {
    val inner = "Content-Type: multipart/alternative; boundary=IN\r\n" +
      "\r\n--IN\r\nContent-Type: text/plain\r\n\r\nalpha\r\n" +
      "--IN\r\nContent-Type: text/html\r\n\r\n<b>beta</b>\r\n--IN--\r\n"
    val raw = "Content-Type: multipart/mixed; boundary=OUT\r\n\r\n" +
      "--OUT\r\n" + inner + "\r\n--OUT\r\n" +
      "Content-Type: text/plain\r\n\r\ngamma\r\n--OUT--\r\n"
    val m = Mime.parseMessage(raw)
    assert(m.parts.map(_.text.trim) == Seq("alpha", "<b>beta</b>", "gamma"))
  }

  test("unterminated multipart yields the parts seen so far") {
    val raw = "Content-Type: multipart/mixed; boundary=B\r\n\r\n" +
      "--B\r\nContent-Type: text/plain\r\n\r\nonly part\r\n"
    val m = Mime.parseMessage(raw)
    assert(m.parts.map(_.text.trim) == Seq("only part"))
  }

  test("mbox spool walk with mboxrd escaping") {
    val m1 = Mime.buildMessage("x@y", "first", "From the start\nbody",
      "<p>h</p>", Seq.empty, "B1")
    val m2 = Mime.buildMessage("z@w", "second",
      "plain\nFrom here escaped\n>From too", "<p>i</p>", Seq.empty, "B2")
    val spool = Mime.buildMbox(Seq(m1, m2))
    val back = Mime.parseMbox(spool)
    assert(back.length == 2)
    val p1 = Mime.parseMessage(back(0))
    val p2 = Mime.parseMessage(back(1))
    assert(p1.header("Subject").contains("first"))
    assert(p2.header("Subject").contains("second"))
    // the From-escaped body lines survive exactly (QP protects them
    // inside the part; the mboxrd layer protects raw occurrences)
    assert(p2.parts(0).text ==
      "plain\nFrom here escaped\n>From too")
  }

  test("fuzz never throws") {
    val rnd = new scala.util.Random(0x31113)
    for (_ <- 0 until 1500) {
      val junk = (0 until rnd.nextInt(12)).map(_ =>
        rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
        .mkString("\n")
      Mime.parseMessage(junk)
      Mime.parseMbox(junk)
      Mime.parseMessage(
        "Content-Type: multipart/mixed; boundary=Q\n\n" + junk)
    }
  }

  test("quoted boundary containing ';' (RFC 2045 tspecial) walks") {
    // foreign mail: our builder never emits such boundaries, but ';'
    // inside a QUOTED parameter value is legal and must not truncate
    // the Content-Type parameter scan (r11 advice)
    val raw =
      "From: x@y.z\r\n" +
      "Content-Type: multipart/mixed; boundary=\"a;b\"; charset=utf-8\r\n" +
      "\r\n" +
      "--a;b\r\n" +
      "Content-Type: text/plain\r\n\r\n" +
      "first part\r\n" +
      "--a;b\r\n" +
      "Content-Type: text/plain\r\n\r\n" +
      "second part\r\n" +
      "--a;b--\r\n"
    val m = Mime.parseMessage(raw)
    assert(m.parts.length == 2, s"expected 2 parts, got ${m.parts.length}")
    assert(m.parts(0).text.trim == "first part")
    assert(m.parts(1).text.trim == "second part")
    // quoted-pair inside the quoted value must not end the string
    val raw2 = "Content-Type: multipart/mixed; " +
      "boundary=\"q\\\";x\"\r\n\r\n--q\";x\r\n\r\nbody\r\n--q\";x--\r\n"
    val m2 = Mime.parseMessage(raw2)
    assert(m2.parts.length == 1)
  }
}
