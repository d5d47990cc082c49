package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** XLSX pins: a hand-written ECMA-376 example package parses to
  * the exact typed cells (the spec-byte differential — no JVM
  * spreadsheet library ships with Spark, the MessagePack
  * situation), build→parse round-trips every cell type incl.
  * shared-string pooling, rich-text shared strings concatenate,
  * inline strings and entity escapes decode, cell-ref arithmetic
  * is exact at the column-letter boundaries, and rejection/fuzz
  * paths never throw. */
class XlsxSpec extends AnyFunSuite {

  test("cell reference arithmetic at the letter boundaries") {
    assert(Xlsx.parseRef("A1") == Some((1, 1)))
    assert(Xlsx.parseRef("Z9") == Some((26, 9)))
    assert(Xlsx.parseRef("AA1") == Some((27, 1)))
    assert(Xlsx.parseRef("AZ3") == Some((52, 3)))
    assert(Xlsx.parseRef("BA3") == Some((53, 3)))
    assert(Xlsx.parseRef("ZZ1") == Some((702, 1)))
    assert(Xlsx.parseRef("AAA1") == Some((703, 1)))
    assert(Xlsx.parseRef("XFD1048576") == Some((16384, 1048576)))
    assert(Xlsx.parseRef("XFE1").isEmpty) // past the sheet edge
    assert(Xlsx.parseRef("A0").isEmpty)
    assert(Xlsx.parseRef("1A").isEmpty)
    assert(Xlsx.parseRef("").isEmpty)
    (1 to 20000).foreach { c =>
      val ref = Xlsx.renderRef(c, c)
      assert(c > 16384 || Xlsx.parseRef(ref) == Some((c, c)), ref)
    }
  }

  /** The minimal package shape real writers emit, hand-authored
    * from the ECMA-376 examples — independent of our builder. */
  private def handPackage: Array[Byte] = {
    val ct = """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/></Types>"""
    val rootRels = """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""
    val wb = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Data &amp; More" sheetId="1" r:id="rId7"/><sheet name="Empty" sheetId="2" r:id="rId8"/></sheets></workbook>"""
    val wbRels = """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId8" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/><Relationship Id="rId7" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>"""
    // rich-text run split + xml:space, the shapes Excel emits
    val ss = """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3"><si><t>hello</t></si><si><r><rPr><b/></rPr><t>wor</t></r><r><t xml:space="preserve">ld </t></r></si><si><t>a&lt;b&amp;c</t></si></sst>"""
    val s1 = """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>42</v></c><c r="C1"><v>2.5</v></c></row><row r="3"><c r="A3" t="s"><v>1</v></c><c r="B3" t="b"><v>1</v></c><c r="C3" t="e"><v>#DIV/0!</v></c><c r="D3" t="inlineStr"><is><t>in line</t></is></c><c r="E3" t="str"><v>=SUM says 7</v></c><c r="F3" t="s"><v>2</v></c><c r="G3"/></row></sheetData></worksheet>"""
    val s2 = """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData/></worksheet>"""
    Zip.buildArchive(Seq(
      ("[Content_Types].xml", ct.getBytes("UTF-8"), true),
      ("_rels/.rels", rootRels.getBytes("UTF-8"), true),
      ("xl/workbook.xml", wb.getBytes("UTF-8"), true),
      ("xl/_rels/workbook.xml.rels", wbRels.getBytes("UTF-8"), true),
      ("xl/sharedStrings.xml", ss.getBytes("UTF-8"), true),
      ("xl/worksheets/sheet1.xml", s1.getBytes("UTF-8"), true),
      ("xl/worksheets/sheet2.xml", s2.getBytes("UTF-8"), true)))
  }

  test("a hand-authored spec package parses to exact typed cells") {
    val wb = Xlsx.parse(handPackage).get
    assert(wb.sheets.map(_.name) == Seq("Data & More", "Empty"))
    val cells = wb.sheets.head.cells
    assert(cells == Seq(
      Xlsx.Cell(1, 1, Xlsx.StrVal("hello")),
      Xlsx.Cell(1, 2, Xlsx.NumVal(42.0)),
      Xlsx.Cell(1, 3, Xlsx.NumVal(2.5)),
      Xlsx.Cell(3, 1, Xlsx.StrVal("world ")), // rich-text runs concat
      Xlsx.Cell(3, 2, Xlsx.BoolVal(true)),
      Xlsx.Cell(3, 3, Xlsx.ErrVal("#DIV/0!")),
      Xlsx.Cell(3, 4, Xlsx.StrVal("in line")),
      Xlsx.Cell(3, 5, Xlsx.StrVal("=SUM says 7")),
      Xlsx.Cell(3, 6, Xlsx.StrVal("a<b&c"))))
    assert(wb.sheets(1).cells.isEmpty)
  }

  test("build -> parse round-trips every cell type") {
    val rows1: Seq[Seq[Xlsx.CellVal]] = Seq(
      Seq(Xlsx.StrVal("alpha"), Xlsx.NumVal(1.0),
        Xlsx.NumVal(-2.25)),
      Seq(Xlsx.StrVal("beta & <gamma>"), Xlsx.BoolVal(false),
        Xlsx.ErrVal("#N/A")),
      Seq(Xlsx.StrVal("alpha"), Xlsx.NumVal(1e300),
        Xlsx.StrVal("tab\tand\nnewline")))
    val rows2: Seq[Seq[Xlsx.CellVal]] =
      Seq(Seq(Xlsx.NumVal(7.0)))
    val bytes = Xlsx.build(Seq(("S one", rows1), ("två", rows2)))
    val wb = Xlsx.parse(bytes).get
    assert(wb.sheets.map(_.name) == Seq("S one", "två"))
    val got = wb.sheets.head.cells
      .map(c => (c.row, c.col, c.value))
    val want = rows1.zipWithIndex.flatMap { case (r, i) =>
      r.zipWithIndex.map { case (v, j) => (i + 1, j + 1, v) }
    }
    assert(got == want)
    assert(wb.sheets(1).cells ==
      Seq(Xlsx.Cell(1, 1, Xlsx.NumVal(7.0))))
    // shared strings really pooled: "alpha" appears once in the xml
    val ssXml = new String(Zip.parseWithData(bytes).collectFirst {
      case (e, d) if e.name == "xl/sharedStrings.xml" => d
    }.get, "UTF-8")
    assert("alpha".r.findAllIn(ssXml).length == 1)
  }

  test("rejections and fuzz never throw") {
    assert(Xlsx.parse(Array.emptyByteArray).isEmpty)
    assert(Xlsx.parse("PK".getBytes("ASCII")).isEmpty)
    // zip without workbook part
    assert(Xlsx.parse(Zip.buildArchive(Seq(
      ("a.txt", "x".getBytes, false)))).isEmpty)
    // dangling relationship id
    val bad = {
      val ok = handPackage
      val parts = Zip.parseWithData(ok).map { case (e, d) =>
        val nd = if (e.name == "xl/_rels/workbook.xml.rels")
          new String(d, "UTF-8").replace("rId7", "rId9")
            .getBytes("UTF-8")
        else d
        (e.name, nd, true)
      }
      Zip.buildArchive(parts)
    }
    assert(Xlsx.parse(bad).isEmpty)
    // shared-string index out of range rejects
    val oob = {
      val parts = Zip.parseWithData(handPackage).map { case (e, d) =>
        val nd = if (e.name == "xl/worksheets/sheet1.xml")
          new String(d, "UTF-8")
            .replace("""<c r="A1" t="s"><v>0</v>""",
              """<c r="A1" t="s"><v>99</v>""").getBytes("UTF-8")
        else d
        (e.name, nd, true)
      }
      Zip.buildArchive(parts)
    }
    assert(Xlsx.parse(oob).isEmpty)
    // mutation fuzz over the whole package
    val ok = handPackage
    val rnd = new scala.util.Random(65)
    (0 until 400).foreach { _ =>
      val m = ok.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      Xlsx.parse(m)
    }
    (0 until 200).foreach { _ =>
      Xlsx.parse(Array.fill(rnd.nextInt(100))(rnd.nextInt().toByte))
    }
  }
}
