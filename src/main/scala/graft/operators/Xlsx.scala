package graft.operators

/** XLSX workbooks (ECMA-376 SpreadsheetML, the Office Open XML
  * spreadsheet package) — after PDF/EPUB/DOCX/MIME, the remaining
  * office container a document-corpus pipeline meets daily:
  * tabular training data arrives as spreadsheets as often as CSV.
  * Built on the repo's verified [[Zip]] walker with a minimal,
  * strict XML pull scanner (tags + attributes + entity decode —
  * the SpreadsheetML subset needs no DTDs or processing
  * instructions beyond the declaration).
  *
  * Read ([[parse]]):
  *  - `xl/workbook.xml` lists sheets (name + r:id), resolved
  *    through `xl/_rels/workbook.xml.rels` to worksheet parts
  *    (the RELATIONSHIP indirection is mandatory — sheet order in
  *    the workbook, target paths in the rels).
  *  - `xl/sharedStrings.xml` string-pool items concatenate every
  *    `<t>` descendant (rich-text runs split one logical string
  *    across `<r>` elements).
  *  - worksheet `<sheetData>`: rows with `r` indexes, cells with
  *    A1-style `r` refs and the live type alphabet — `s` (shared
  *    string), `str` (formula result string), `inlineStr`
  *    (`<is><t>`), `b` (boolean), `e` (error), and default numeric.
  *    Dates stay raw serial NUMBERS (style-table date formatting is
  *    presentation, not data — deliberately not decoded).
  *  - None on any malformation: bad zip, missing parts, dangling
  *    rels, shared-string index out of range, unparseable refs or
  *    numbers, cells outside their declared row. Never invent.
  *
  * Write ([[build]]): the canonical minimal package —
  * content types, root rels, workbook + rels, one shared-strings
  * pool (every string shared, the common writer layout), worksheets
  * with explicit row/cell refs. Reader and writer are
  * independently spec-derived; XlsxSpec round-trips them against
  * each other and pins hand-written ECMA-376 example bytes (no
  * JVM spreadsheet library ships with Spark to differential
  * against — the MessagePack validation situation, recorded in
  * COVERAGE.md).
  *
  * Scale: parsing is a pure per-file map (flatMap over binary
  * rows) — the 100 TB path is the same binaryFile scan every other
  * document format uses. Bomb guards: 1 MiB per XML part decoded
  * text, 2^20 cells/strings per part. */
object Xlsx {

  sealed trait CellVal
  final case class NumVal(v: Double) extends CellVal
  final case class StrVal(v: String) extends CellVal
  final case class BoolVal(v: Boolean) extends CellVal
  final case class ErrVal(v: String) extends CellVal

  final case class Cell(row: Int, col: Int, value: CellVal)
  final case class Sheet(name: String, cells: Seq[Cell])
  final case class Workbook(sheets: Seq[Sheet])

  private final val MaxPart = 1 << 20
  private final val MaxItems = 1 << 20

  // ---------------------------------------------------------------
  // Minimal XML pull scanner
  // ---------------------------------------------------------------

  private[operators] sealed trait XTok
  private[operators] final case class XStart(name: String,
      attrs: Map[String, String], selfClose: Boolean) extends XTok
  private[operators] final case class XEnd(name: String) extends XTok
  private[operators] final case class XText(text: String) extends XTok

  /** Strip any namespace prefix (SpreadsheetML uses a default
    * namespace; rels files sometimes don't). */
  private def local(n: String): String = {
    val i = n.indexOf(':')
    if (i < 0) n else n.substring(i + 1)
  }

  private def decodeEntities(s: String): Option[String] = {
    if (!s.contains('&')) return Some(s)
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val j = s.indexOf(';', i + 1)
        if (j < 0 || j - i > 12) return None
        val ent = s.substring(i + 1, j)
        ent match {
          case "amp" => out.append('&')
          case "lt" => out.append('<')
          case "gt" => out.append('>')
          case "quot" => out.append('"')
          case "apos" => out.append('\'')
          case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
            val cp = try Integer.parseInt(ent.drop(2), 16)
              catch { case _: NumberFormatException => return None }
            if (cp < 0 || cp > 0x10ffff ||
              (cp >= 0xd800 && cp <= 0xdfff)) return None
            out.appendAll(Character.toChars(cp))
          case _ if ent.startsWith("#") =>
            val cp = try Integer.parseInt(ent.drop(1))
              catch { case _: NumberFormatException => return None }
            if (cp < 0 || cp > 0x10ffff ||
              (cp >= 0xd800 && cp <= 0xdfff)) return None
            out.appendAll(Character.toChars(cp))
          case _ => return None
        }
        i = j + 1
      }
    }
    Some(out.toString)
  }

  /** Tokenize one XML part. None on malformation (unclosed tags,
    * bad entities, stray '<'). Comments and the XML declaration
    * drop; CDATA becomes text. */
  private[operators] def scanXml(xml: String): Option[Seq[XTok]] = {
    val out = Seq.newBuilder[XTok]
    var i = 0
    val n = xml.length
    var count = 0
    while (i < n) {
      if (count > MaxItems * 4) return None
      count += 1
      if (xml.charAt(i) == '<') {
        if (xml.startsWith("<?", i)) {
          val j = xml.indexOf("?>", i + 2)
          if (j < 0) return None
          i = j + 2
        } else if (xml.startsWith("<!--", i)) {
          val j = xml.indexOf("-->", i + 4)
          if (j < 0) return None
          i = j + 3
        } else if (xml.startsWith("<![CDATA[", i)) {
          val j = xml.indexOf("]]>", i + 9)
          if (j < 0) return None
          out += XText(xml.substring(i + 9, j))
          i = j + 3
        } else if (xml.startsWith("</", i)) {
          val j = xml.indexOf('>', i + 2)
          if (j < 0) return None
          out += XEnd(local(xml.substring(i + 2, j).trim))
          i = j + 1
        } else {
          val j = xml.indexOf('>', i + 1)
          if (j < 0) return None
          var body = xml.substring(i + 1, j)
          val selfClose = body.endsWith("/")
          if (selfClose) body = body.dropRight(1)
          // split name from attributes
          var k = 0
          while (k < body.length && !body.charAt(k).isWhitespace)
            k += 1
          val name = local(body.take(k))
          if (name.isEmpty) return None
          var attrs = Map.empty[String, String]
          var p = k
          while (p < body.length) {
            while (p < body.length && body.charAt(p).isWhitespace)
              p += 1
            if (p < body.length) {
              val eq = body.indexOf('=', p)
              if (eq < 0) return None
              val an = body.substring(p, eq).trim
              var q = eq + 1
              while (q < body.length && body.charAt(q).isWhitespace)
                q += 1
              if (q >= body.length ||
                (body.charAt(q) != '"' && body.charAt(q) != '\''))
                return None
              val quote = body.charAt(q)
              val qe = body.indexOf(quote, q + 1)
              if (qe < 0) return None
              val av = decodeEntities(body.substring(q + 1, qe))
                .getOrElse(return None)
              attrs += (an -> av) // keep the FULL attr name (r:id)
              p = qe + 1
            }
          }
          out += XStart(name, attrs, selfClose)
          i = j + 1
        }
      } else {
        var j = xml.indexOf('<', i)
        if (j < 0) j = n
        val t = decodeEntities(xml.substring(i, j))
          .getOrElse(return None)
        if (t.nonEmpty) out += XText(t) // consumers gate on context
        i = j
      }
    }
    Some(out.result())
  }

  // ---------------------------------------------------------------
  // Cell references
  // ---------------------------------------------------------------

  /** "BC23" → (col=55, row=23); 1-based both. */
  def parseRef(ref: String): Option[(Int, Int)] = {
    var i = 0
    var col = 0
    while (i < ref.length && ref.charAt(i) >= 'A' &&
      ref.charAt(i) <= 'Z') {
      col = col * 26 + (ref.charAt(i) - 'A' + 1)
      if (col > 16384) return None
      i += 1
    }
    if (i == 0 || i == ref.length) return None
    val rowS = ref.substring(i)
    if (!rowS.forall(_.isDigit) || rowS.length > 7) return None
    val row = rowS.toInt
    if (row < 1 || row > 1048576) None else Some((col, row))
  }

  /** (col=55, row=23) → "BC23". */
  def renderRef(col: Int, row: Int): String = {
    require(col >= 1 && row >= 1, "refs are 1-based")
    val sb = new StringBuilder
    var c = col
    while (c > 0) {
      val d = (c - 1) % 26
      sb.insert(0, ('A' + d).toChar)
      c = (c - 1) / 26
    }
    sb.append(row).toString
  }

  // ---------------------------------------------------------------
  // Parse
  // ---------------------------------------------------------------

  private def partText(entries: Seq[(Zip.ZipEntry, Array[Byte])],
      name: String): Option[String] =
    entries.collectFirst {
      case (e, data) if e.name == name =>
        if (data.length > MaxPart) None
        else {
          val dec = java.nio.charset.StandardCharsets.UTF_8
            .newDecoder()
          try Some(dec.decode(java.nio.ByteBuffer.wrap(data))
            .toString)
          catch {
            case _: java.nio.charset.CharacterCodingException => None
          }
        }
    }.flatten

  /** Concatenated `<t>` text of each `<si>` item. */
  private def sharedStrings(xml: String): Option[Vector[String]] = {
    val toks = scanXml(xml).getOrElse(return None)
    val items = Vector.newBuilder[String]
    var inSi = false
    var inT = false
    var cur = new StringBuilder
    toks.foreach {
      case XStart("si", _, false) => inSi = true; cur = new StringBuilder
      case XEnd("si") => if (!inSi) return None
        items += cur.toString; inSi = false
      case XStart("t", _, sc) if inSi =>
        if (sc) () else inT = true
      case XEnd("t") => inT = false
      case XText(t) if inT => cur.append(t)
      case _ => ()
    }
    val r = items.result()
    if (r.length > MaxItems) None else Some(r)
  }

  /** One worksheet part's cells. */
  private def sheetCells(xml: String, shared: Vector[String])
      : Option[Seq[Cell]] = {
    val toks = scanXml(xml).getOrElse(return None)
    val cells = Seq.newBuilder[Cell]
    var curRow = -1
    var cellRef: Option[(Int, Int)] = None
    var cellType = ""
    var inV = false
    var inIsT = false
    var vText: Option[String] = None
    var nCells = 0
    def flush(): Boolean = cellRef match {
      case None => true
      case Some((c, r)) =>
        nCells += 1
        if (nCells > MaxItems) return false
        val v: Option[CellVal] = cellType match {
          case "s" => vText.flatMap(t =>
            t.trim.toIntOption.flatMap(ix =>
              if (ix < 0 || ix >= shared.length) None
              else Some(StrVal(shared(ix)))))
          case "str" => Some(StrVal(vText.getOrElse("")))
          case "inlineStr" => Some(StrVal(vText.getOrElse("")))
          case "b" => vText.map(_.trim) match {
            case Some("1") => Some(BoolVal(true))
            case Some("0") => Some(BoolVal(false))
            case _ => None
          }
          case "e" => vText.map(ErrVal)
          case "" | "n" => vText match {
            case None => None // valueless cell: skip silently below
            case Some(t) =>
              t.trim.toDoubleOption.map(NumVal)
          }
          case _ => None
        }
        if (vText.isEmpty && (cellType == "" || cellType == "n")) {
          cellRef = None; vText = None; true // empty cell, no value
        } else v match {
          case Some(cv) =>
            if (curRow >= 0 && r != curRow) false
            else { cells += Cell(r, c, cv)
              cellRef = None; vText = None; true }
          case None => false
        }
    }
    toks.foreach {
      case XStart("row", attrs, sc) =>
        if (!flush()) return None
        curRow = attrs.get("r").flatMap(_.toIntOption).getOrElse(-1)
        if (sc) curRow = -1
      case XEnd("row") =>
        if (!flush()) return None
        curRow = -1
      case XStart("c", attrs, sc) =>
        if (!flush()) return None
        cellRef = attrs.get("r").flatMap(parseRef)
        if (cellRef.isEmpty) return None
        cellType = attrs.getOrElse("t", "")
        vText = None
        if (sc) cellRef = None // no value
      case XEnd("c") =>
        if (!flush()) return None
      case XStart("v", _, sc) => if (!sc) inV = true
      case XEnd("v") => inV = false
      case XStart("t", _, sc) if cellType == "inlineStr" =>
        if (sc) vText = Some(vText.getOrElse(""))
        else inIsT = true
      case XEnd("t") => inIsT = false
      case XText(t) if inV || inIsT =>
        vText = Some(vText.getOrElse("") + t)
      case _ => ()
    }
    if (!flush()) return None
    Some(cells.result())
  }

  /** Parse a whole workbook from package bytes. */
  def parse(bytes: Array[Byte]): Option[Workbook] = {
    val entries = Zip.parseWithData(bytes) // never throws
    if (entries.isEmpty) return None
    val wbXml = partText(entries, "xl/workbook.xml")
      .getOrElse(return None)
    val relsXml = partText(entries, "xl/_rels/workbook.xml.rels")
      .getOrElse(return None)
    val shared = partText(entries, "xl/sharedStrings.xml") match {
      case Some(x) => sharedStrings(x).getOrElse(return None)
      case None => Vector.empty[String]
    }
    // rels: Id -> Target (worksheet parts are relative to xl/)
    val rels = scanXml(relsXml).getOrElse(return None).collect {
      case XStart("Relationship", attrs, _) =>
        (attrs.getOrElse("Id", ""), attrs.getOrElse("Target", ""))
    }.toMap
    val sheetDefs = scanXml(wbXml).getOrElse(return None).collect {
      case XStart("sheet", attrs, _) =>
        (attrs.getOrElse("name", ""),
          attrs.collectFirst {
            case (k, v) if local(k) == "id" => v }.getOrElse(""))
    }
    if (sheetDefs.isEmpty ||
      sheetDefs.exists(s => s._1.isEmpty || s._2.isEmpty))
      return None
    val sheets = sheetDefs.map { case (name, rid) =>
      val target = rels.getOrElse(rid, return None)
      val path =
        if (target.startsWith("/")) target.drop(1)
        else s"xl/$target"
      val xml = partText(entries, path).getOrElse(return None)
      Sheet(name, sheetCells(xml, shared).getOrElse(return None))
    }
    if (sheets.map(_.name).distinct.length != sheets.length) None
    else Some(Workbook(sheets))
  }

  // ---------------------------------------------------------------
  // Build
  // ---------------------------------------------------------------

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' =>
        sb.append(f"&#${c.toInt}%d;")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Render a double the way spreadsheet writers do: integral
    * values without the trailing `.0`. */
  private def num(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15 &&
      !java.lang.Double.isNaN(d)) d.toLong.toString
    else d.toString

  /** Build a workbook package. Strings pool into sharedStrings
    * (the common writer layout); cells lay out row-major from A1. */
  def build(sheets: Seq[(String, Seq[Seq[CellVal]])]): Array[Byte] = {
    require(sheets.nonEmpty, "workbook needs at least one sheet")
    require(sheets.map(_._1).distinct.length == sheets.length,
      "duplicate sheet name")
    val pool = scala.collection.mutable.LinkedHashMap
      .empty[String, Int]
    def poolIx(s: String): Int =
      pool.getOrElseUpdate(s, pool.size)
    val sheetXmls = sheets.map { case (_, rows) =>
      val sb = new StringBuilder
      sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\" " +
        "standalone=\"yes\"?>\n")
      sb.append("<worksheet xmlns=\"http://schemas.openxmlformats" +
        ".org/spreadsheetml/2006/main\"><sheetData>")
      rows.zipWithIndex.foreach { case (cells, r0) =>
        val r = r0 + 1
        sb.append(s"""<row r="$r">""")
        cells.zipWithIndex.foreach { case (cv, c0) =>
          val ref = renderRef(c0 + 1, r)
          cv match {
            case NumVal(d) =>
              sb.append(s"""<c r="$ref"><v>${num(d)}</v></c>""")
            case StrVal(s) =>
              sb.append(s"""<c r="$ref" t="s"><v>${
                poolIx(s)}</v></c>""")
            case BoolVal(b) =>
              sb.append(s"""<c r="$ref" t="b"><v>${
                if (b) 1 else 0}</v></c>""")
            case ErrVal(e) =>
              sb.append(s"""<c r="$ref" t="e"><v>${esc(e)}</v></c>""")
          }
        }
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>")
      sb.toString
    }
    val ssXml = {
      val sb = new StringBuilder
      sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\" " +
        "standalone=\"yes\"?>\n")
      sb.append(s"""<sst xmlns="http://schemas.openxmlformats""" +
        s""".org/spreadsheetml/2006/main" count="${pool.size}" """ +
        s"""uniqueCount="${pool.size}">""")
      pool.keys.foreach(s =>
        sb.append(s"<si><t xml:space=\"preserve\">${esc(s)}</t></si>"))
      sb.append("</sst>")
      sb.toString
    }
    val wbXml = {
      val sb = new StringBuilder
      sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\" " +
        "standalone=\"yes\"?>\n")
      sb.append("<workbook xmlns=\"http://schemas.openxmlformats" +
        ".org/spreadsheetml/2006/main\" " +
        "xmlns:r=\"http://schemas.openxmlformats.org/" +
        "officeDocument/2006/relationships\"><sheets>")
      sheets.zipWithIndex.foreach { case ((name, _), i) =>
        sb.append(s"""<sheet name="${esc(name)}" sheetId="${i + 1}" """ +
          s"""r:id="rId${i + 1}"/>""")
      }
      sb.append("</sheets></workbook>")
      sb.toString
    }
    val wbRels = {
      val sb = new StringBuilder
      sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\" " +
        "standalone=\"yes\"?>\n")
      sb.append("<Relationships xmlns=\"http://schemas." +
        "openxmlformats.org/package/2006/relationships\">")
      sheets.indices.foreach { i =>
        sb.append(s"""<Relationship Id="rId${i + 1}" """ +
          "Type=\"http://schemas.openxmlformats.org/officeDocument" +
          "/2006/relationships/worksheet\" " +
          s"""Target="worksheets/sheet${i + 1}.xml"/>""")
      }
      sb.append(s"""<Relationship Id="rId${sheets.length + 1}" """ +
        "Type=\"http://schemas.openxmlformats.org/officeDocument" +
        "/2006/relationships/sharedStrings\" " +
        "Target=\"sharedStrings.xml\"/>")
      sb.append("</Relationships>")
      sb.toString
    }
    val rootRels =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/" +
        "package/2006/relationships\"><Relationship Id=\"rId1\" " +
        "Type=\"http://schemas.openxmlformats.org/officeDocument/" +
        "2006/relationships/officeDocument\" " +
        "Target=\"xl/workbook.xml\"/></Relationships>"
    val contentTypes =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/" +
        "2006/content-types\">" +
        "<Default Extension=\"rels\" ContentType=\"application/vnd." +
        "openxmlformats-package.relationships+xml\"/>" +
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
        "<Override PartName=\"/xl/workbook.xml\" ContentType=" +
        "\"application/vnd.openxmlformats-officedocument." +
        "spreadsheetml.sheet.main+xml\"/>" +
        sheets.indices.map(i =>
          s"<Override PartName=\"/xl/worksheets/sheet${i + 1}.xml\" " +
            "ContentType=\"application/vnd.openxmlformats-" +
            "officedocument.spreadsheetml.worksheet+xml\"/>")
          .mkString +
        "<Override PartName=\"/xl/sharedStrings.xml\" ContentType=" +
        "\"application/vnd.openxmlformats-officedocument." +
        "spreadsheetml.sharedStrings+xml\"/>" +
        "</Types>"
    val files: Seq[(String, Array[Byte], Boolean)] =
      Seq(("[Content_Types].xml", contentTypes.getBytes("UTF-8"), true),
        ("_rels/.rels", rootRels.getBytes("UTF-8"), true),
        ("xl/workbook.xml", wbXml.getBytes("UTF-8"), true),
        ("xl/_rels/workbook.xml.rels", wbRels.getBytes("UTF-8"), true),
        ("xl/sharedStrings.xml", ssXml.getBytes("UTF-8"), true)) ++
        sheetXmls.zipWithIndex.map { case (x, i) =>
          (s"xl/worksheets/sheet${i + 1}.xml",
            x.getBytes("UTF-8"), true)
        }
    Zip.buildArchive(files)
  }
}
