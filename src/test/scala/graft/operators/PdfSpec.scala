package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** PDF pins: build→extract round trips (plain + FlateDecode, multi-
  * page), the full literal-string escape set incl. octal and line
  * continuations, hex strings, TJ kern-array concatenation, content
  * arrays, encryption/xref-stream/unknown-filter rejections, and
  * mutation + garbage fuzz. */
class PdfSpec extends AnyFunSuite {

  test("build -> extract round trips, both stream codings") {
    for (flate <- Seq(false, true)) {
      val pages = Seq(
        ("Pg 0", "hello world body"),
        ("Pg 1", "parens (nested (deep)) and \\ backslash"),
        ("Pg 2", "tabs\tand  double  spaces"))
      val pdf = Pdf.build(pages, flate)
      assert(Pdf.isPdf(pdf))
      val got = Pdf.extractText(pdf).get
      val want = pages.map { case (h, b) => s"$h $b" }.mkString("\n")
      assert(got == want, s"flate=$flate")
    }
  }

  test("literal-string escapes: octal, continuations, specials") {
    // hand-build a tiny content stream through a full document by
    // using body text that exercises the writer's escaping, then a
    // hand-written object for the exotic forms
    val raw = "%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
    val content = "BT (A\\101\\)) Tj (line\\\ncont) Tj " +
      "[(kern) -120 (join)] TJ <48495f4A> Tj ET"
    val obj4 = s"4 0 obj << /Length ${content.length} >> stream\n" +
      content + "\nendstream endobj\n"
    val body = raw + obj4
    val offs = Seq("1 0 obj", "2 0 obj", "3 0 obj", "4 0 obj")
      .map(body.indexOf(_))
    val xref = body.length
    val full = body + s"xref\n0 5\n0000000000 65535 f \n" +
      offs.map(o => f"$o%010d 00000 n \n").mkString +
      s"trailer << /Size 5 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n"
    val got = Pdf.extractText(full.getBytes("ISO-8859-1")).get
    // \101 = 'A', \) = ')', continuation joins, TJ concats, hex "HI_J"
    assert(got == "AA) linecont kernjoin HI_J")
  }

  test("contents arrays concatenate in order") {
    // page with /Contents [4 0 R 5 0 R]
    val c1 = "BT (first) Tj ET"
    val c2 = "BT (second) Tj ET"
    val body = "%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >> endobj\n" +
      s"4 0 obj << /Length ${c1.length} >> stream\n$c1\nendstream endobj\n" +
      s"5 0 obj << /Length ${c2.length} >> stream\n$c2\nendstream endobj\n"
    val offs = (1 to 5).map(n => body.indexOf(s"$n 0 obj"))
    val full = body + s"xref\n0 6\n0000000000 65535 f \n" +
      offs.map(o => f"$o%010d 00000 n \n").mkString +
      s"trailer << /Size 6 /Root 1 0 R >>\nstartxref\n${body.length}\n%%EOF\n"
    assert(Pdf.extractText(full.getBytes("ISO-8859-1")).get ==
      "first second")
  }

  test("modern form: xref stream + ObjStm, predictor on and off") {
    for (pred <- Seq(false, true)) {
      val pages = Seq(
        ("Pg 0", "modern body with (parens) here"),
        ("Pg 1", "second page text"),
        ("Pg 2", "third"))
      val pdf = Pdf.buildModern(pages, xrefPredictor = pred)
      assert(new String(pdf.take(9), "ISO-8859-1") == "%PDF-1.5\n")
      val got = Pdf.extractText(pdf).get
      val want = pages.map { case (h, b) => s"$h $b" }.mkString("\n")
      assert(got == want, s"predictor=$pred")
    }
  }

  test("classic and modern forms of the same document extract equally") {
    val pages = Seq(("H1", "same content either way"),
      ("H2", "pages two"))
    val classic = Pdf.extractText(Pdf.build(pages, flate = true)).get
    val modern = Pdf.extractText(
      Pdf.buildModern(pages, xrefPredictor = true)).get
    assert(classic == modern)
  }

  test("modern-form mutation fuzz never throws") {
    val good = Pdf.buildModern(Seq(("A", "fuzz body")),
      xrefPredictor = true)
    val rnd = new scala.util.Random(0x5df)
    for (_ <- 0 until 1500) {
      val bad = good.clone()
      bad(rnd.nextInt(bad.length)) = rnd.nextInt().toByte
      Pdf.extractText(bad) // must not throw
    }
    for (n <- 0 until good.length by 5)
      Pdf.extractText(good.take(n))
  }

  test("rejections: encryption, xref streams, unknown filters") {
    val good = Pdf.build(Seq(("H", "body text")), flate = false)
    val s = new String(good, "ISO-8859-1")
    // /Encrypt in the trailer
    val enc = s.replace("/Size", "/Encrypt 9 0 R /Size")
    assert(Pdf.extractText(enc.getBytes("ISO-8859-1")).isEmpty)
    // xref stream shape: startxref pointing at an object
    val xs = s.replaceAll("startxref\n\\d+", "startxref\n9")
    assert(Pdf.extractText(xs.getBytes("ISO-8859-1")).isEmpty)
    // unknown filter
    val lzw = s.replace("<< /Length", "<< /Filter /LZWDecode /Length")
    assert(Pdf.extractText(lzw.getBytes("ISO-8859-1")).isEmpty)
    // truncation sweep never throws
    for (n <- 0 until good.length by 7)
      Pdf.extractText(good.take(n))
  }

  test("mutation and garbage fuzz never throw") {
    val good = Pdf.build(Seq(("A", "mutation body")), flate = true)
    val rnd = new scala.util.Random(0xbdf)
    for (_ <- 0 until 1500) {
      val bad = good.clone()
      bad(rnd.nextInt(bad.length)) = rnd.nextInt().toByte
      Pdf.extractText(bad) // must not throw
    }
    for (_ <- 0 until 1500) {
      val junk = Array.fill(rnd.nextInt(128))(rnd.nextInt().toByte)
      Pdf.extractText(junk)
      Pdf.extractText("%PDF-1.4\n".getBytes ++ junk)
    }
  }
}
