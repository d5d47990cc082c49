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
    // image-codec filter: honest rejection
    val dct = s.replace("<< /Length", "<< /Filter /DCTDecode /Length")
    assert(Pdf.extractText(dct.getBytes("ISO-8859-1")).isEmpty)
    // a supported filter name over bytes that are NOT that coding
    // must fail the decode, not mis-extract
    val lzw = s.replace("<< /Length", "<< /Filter /LZWDecode /Length")
    assert(Pdf.extractText(lzw.getBytes("ISO-8859-1")).isEmpty)
    // truncation sweep never throws
    for (n <- 0 until good.length by 7)
      Pdf.extractText(good.take(n))
  }

  test("every filter mode extracts the same text") {
    val pages = Seq(("Head one", "body text that repeats a bit"),
      ("Head two", "zzzzzzzzzz run-length food zzzzz"))
    val expect = Pdf.extractText(Pdf.build(pages, "none")).get
    for (m <- Seq("flate", "lzw", "ahx-flate", "a85-rl")) {
      assert(Pdf.extractText(Pdf.build(pages, m)).get == expect, m)
    }
    assert(Pdf.extractText(Pdf.buildModern(pages,
      xrefPredictor = true)).get == expect)
  }

  test("ASCIIHexDecode pins: pairs, whitespace, odd digit, EOD") {
    assert(Pdf.asciiHexDecode("4142>".getBytes("ISO-8859-1"))
      .sameElements("AB".getBytes))
    assert(Pdf.asciiHexDecode("4 1\n42\t4>".getBytes("ISO-8859-1"))
      .sameElements(Array[Byte](0x41, 0x42, 0x40))) // odd → pad 0
    intercept[Throwable](
      Pdf.asciiHexDecode("4142".getBytes)) // EOD required
    intercept[Throwable](Pdf.asciiHexDecode("4G>".getBytes))
    // encoder round trip incl. the 64-pair line breaks
    val rnd = new scala.util.Random(3)
    val data = Array.fill(300)(rnd.nextInt().toByte)
    assert(Pdf.asciiHexDecode(Pdf.ahxEncode(data)).sameElements(data))
  }

  test("ASCII85Decode pins: the computable 'Man ' vector, z, tail") {
    // 'M','a','n',' ' → base-85 digits 24,73,80,78,61 → "9jqo^"
    assert(Pdf.ascii85Decode("9jqo^~>".getBytes("ISO-8859-1"))
      .sameElements("Man ".getBytes))
    assert(Pdf.ascii85Decode("z~>".getBytes)
      .sameElements(Array[Byte](0, 0, 0, 0)))
    // partial tail: "AB" → 3 chars
    assert(Pdf.ascii85Decode(Pdf.a85Encode("AB".getBytes))
      .sameElements("AB".getBytes))
    intercept[Throwable](Pdf.ascii85Decode("9jqo^".getBytes)) // no EOD
    intercept[Throwable](Pdf.ascii85Decode("9z~>".getBytes)) // z mid-group
    intercept[Throwable](Pdf.ascii85Decode("9~>".getBytes)) // lone char
    intercept[Throwable](Pdf.ascii85Decode("vvvvv~>".getBytes)) // > 2^32
    val rnd = new scala.util.Random(7)
    for (len <- Seq(0, 1, 2, 3, 4, 5, 1000)) {
      val data = Array.fill(len)(rnd.nextInt().toByte)
      assert(Pdf.ascii85Decode(Pdf.a85Encode(data)).sameElements(data),
        s"len $len")
    }
  }

  test("RunLengthDecode pins and encoder round trip") {
    assert(Pdf.runLengthDecode(
      Array[Byte](2, 'a', 'b', 'c', 254.toByte, 'x', 128.toByte))
      .sameElements("abcxxx".getBytes))
    intercept[Throwable](
      Pdf.runLengthDecode(Array[Byte](2, 'a', 'b', 'c'))) // no EOD
    intercept[Throwable](
      Pdf.runLengthDecode(Array[Byte](5, 'a', 128.toByte))) // short lit
    val rnd = new scala.util.Random(11)
    // mixed runs and literals, incl. >128 runs and >128 literals
    val data = Array.tabulate(5000)(i =>
      if ((i / 200) % 2 == 0) (i % 7).toByte else rnd.nextInt().toByte)
    assert(Pdf.runLengthDecode(Pdf.rlEncode(data)).sameElements(data))
  }

  test("LZWDecode: differential against the independent TIFF encoder") {
    val rnd = new scala.util.Random(13)
    // repetitive data grows the table fast (width bumps + the 4094
    // reset); 40k input crosses several Clear cycles
    val data = Array.tabulate(40000)(i =>
      if (i % 3 == 0) (i % 11).toByte else ((i * 7) % 23).toByte)
    val enc = Multimodal.tiffLzwEncode(data)
    assert(Pdf.lzwDecodeBytes(enc, 1).sameElements(data))
    val rand = Array.fill(2000)(rnd.nextInt().toByte)
    assert(Pdf.lzwDecodeBytes(Multimodal.tiffLzwEncode(rand), 1)
      .sameElements(rand))
    assert(Pdf.lzwDecodeBytes(
      Multimodal.tiffLzwEncode(Array.emptyByteArray), 1).isEmpty)
    // truncation (bits exhausted before EOD) rejects
    intercept[Throwable](Pdf.lzwDecodeBytes(enc.dropRight(40), 1))
  }

  test("LZWDecode honours EarlyChange 0") {
    // literal-only encoder with the LATE width schedule: the
    // decoder still adds one table entry per code, so the width
    // must bump at exactly 2^w (not 2^w − 1) for the bits to align
    def ec0Encode(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var cur = 0L; var nbits = 0; var width = 9
      def emit(code: Int): Unit = {
        cur = (cur << width) | code; nbits += width
        while (nbits >= 8) {
          out.write(((cur >> (nbits - 8)) & 0xff).toInt); nbits -= 8
        }
        cur &= (1L << nbits) - 1
      }
      emit(256)
      var next = 258; var first = true
      data.foreach { b =>
        emit(b & 0xff)
        if (first) first = false
        else {
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
      }
      emit(257)
      if (nbits > 0) out.write(((cur << (8 - nbits)) & 0xff).toInt)
      out.toByteArray
    }
    val rnd = new scala.util.Random(17)
    // 600 literals push next past the 512 boundary where the two
    // schedules diverge
    val data = Array.fill(600)(rnd.nextInt().toByte)
    assert(Pdf.lzwDecodeBytes(ec0Encode(data), 0).sameElements(data))
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
