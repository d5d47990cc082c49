package graft.operators

/** PDF text extraction (the public PDF 1.7 spec, ISO 32000-1) — the
  * highest-volume document format corpora are mined from. Pure-JVM
  * BUILDER (deterministic minimal documents: catalog → page tree →
  * pages with Helvetica text content streams, optionally
  * FlateDecode-compressed, classic xref table + trailer) and a real
  * PARSER: byte lexer (names, numbers, literal strings with the full
  * escape set incl. octal and line continuations, hex strings,
  * dicts, arrays, refs), `startxref` → xref TABLE chain (`/Prev`
  * walked, caps enforced), lazy object resolution, the Catalog →
  * /Pages → /Kids tree walk, /Contents (single or array) through
  * the whole CLOSED-FORM filter set — FlateDecode, LZWDecode
  * (MSB-first 9→12-bit codes, /EarlyChange 0/1), ASCIIHexDecode,
  * ASCII85Decode, RunLengthDecode, singly or as declaration-order
  * /Filter ARRAY chains with per-filter /DecodeParms — and a
  * content-stream walk that extracts the text operators — `Tj`,
  * `'`, `"`, and `TJ` arrays (kern numbers dropped, strings
  * concatenated, per the simple-extractor convention); text shows
  * join with single spaces, pages with newlines.
  *
  * MODERN (PDF 1.5+) files are covered too: cross-reference STREAMS
  * (/Type /XRef, W-array typed entries, /Index, the PNG predictors
  * they ship with — all five filter rows at bpp 1) and OBJECT
  * streams (/Type /ObjStm member resolution through the N-pair
  * header) — the shape practically every current writer emits; the
  * builder has a `buildModern` twin so both forms round-trip.
  *
  * Honest-subset rejections (None, never mis-extract): encrypted
  * documents (/Encrypt), the image-codec and Crypt filters
  * (DCT/JPX/CCITT/JBIG2 are irrelevant to text extraction), inline
  * images, and any malformation — bad offsets, missing endstream,
  * unresolved refs, recursion/size caps. No bundled JVM PDF library
  * exists to differential against; validation is build→parse round
  * trips with an analytic oracle (`pdf_text_extract`, the filter
  * rotation covering every supported coding), hand-pinned byte
  * constructs (incl. the computable ASCII85 "Man " → `9jqo^`
  * vector), an in-repo LZW differential against the independent
  * TIFF encoder, and fuzz — PdfSpec. */
object Pdf {

  /** `.pdf` sniff. */
  def isPdf(b: Array[Byte]): Boolean =
    b.length >= 5 && b(0) == '%' && b(1) == 'P' && b(2) == 'D' &&
      b(3) == 'F' && b(4) == '-'

  // ---------------------------------------------------------------
  // Object model
  // ---------------------------------------------------------------

  sealed trait PVal
  case object PNull extends PVal
  final case class PBool(v: Boolean) extends PVal
  final case class PNum(v: Double) extends PVal
  final case class PStr(v: Array[Byte]) extends PVal
  final case class PName(v: String) extends PVal
  final case class PArr(vs: Vector[PVal]) extends PVal
  final case class PDict(m: Map[String, PVal]) extends PVal
  final case class PRef(num: Int, gen: Int) extends PVal
  final case class PStream(dict: PDict, raw: Array[Byte]) extends PVal

  // ---------------------------------------------------------------
  // Builder
  // ---------------------------------------------------------------

  /** ASCIIHexDecode's inverse: uppercase hex pairs, 64-pair lines,
    * the `>` EOD marker. */
  def ahxEncode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(data.length * 2 + data.length / 64 + 2)
    var i = 0
    while (i < data.length) {
      sb.append(f"${data(i) & 0xff}%02X")
      if (i % 64 == 63) sb.append('\n')
      i += 1
    }
    sb.append('>')
    sb.toString.getBytes("ISO-8859-1")
  }

  /** ASCII85Decode's inverse: 4-byte groups to 5 chars '!'..'u',
    * all-zero groups as 'z', the partial tail emitting n+1 chars,
    * `~>` EOD. */
  def a85Encode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 5 / 4 + 8)
    var i = 0
    while (i < data.length) {
      val rem = math.min(4, data.length - i)
      var v = 0L
      var j = 0
      while (j < 4) {
        v = (v << 8) |
          (if (j < rem) data(i + j) & 0xffL else 0L)
        j += 1
      }
      if (v == 0L && rem == 4) out.write('z')
      else {
        val cs = new Array[Int](5)
        var k = 4
        while (k >= 0) { cs(k) = (v % 85).toInt; v /= 85; k -= 1 }
        var c = 0
        while (c < rem + 1) { out.write('!' + cs(c)); c += 1 }
      }
      i += 4
    }
    out.write('~'); out.write('>')
    out.toByteArray
  }

  /** RunLengthDecode's inverse: repeats of ≥ 3 become (257−n, byte)
    * runs, literals chunk at 128, EOD 128 closes. */
  def rlEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 8)
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && run < 128 &&
        data(i + run) == data(i)) run += 1
      if (run >= 3) {
        out.write(257 - run); out.write(data(i) & 0xff)
        i += run
      } else {
        // literal chunk up to the next ≥3-repeat or 128 bytes
        var end = i + 1
        var reps = 1
        while (end < data.length && end - i < 128 && reps < 3) {
          if (data(end) == data(end - 1)) reps += 1 else reps = 1
          end += 1
        }
        if (reps == 3) end -= 3 // leave the repeat for the next turn
        val len = end - i
        out.write(len - 1)
        out.write(data, i, len)
        i = end
      }
    }
    out.write(128)
    out.toByteArray
  }

  /** Escape a literal string's specials. */
  private def escapeLit(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '('  => "\\("
      case ')'  => "\\)"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c    => c.toString
    }

  /** One page's content: a heading shown with `Tj` and a body shown
    * as a 2-part `TJ` array (kern between the halves). */
  private def pageContent(heading: String, bodyA: String,
      bodyB: String): String =
    "BT /F1 12 Tf 72 720 Td (" + escapeLit(heading) + ") Tj " +
      "0 -14 Td [(" + escapeLit(bodyA) + ") -50 (" +
      escapeLit(bodyB) + ")] TJ ET"

  /** Build a deterministic PDF: page j shows `headings(j)` then
    * `bodies(j)` (split in two for the TJ path). `flate` compresses
    * every content stream. */
  def build(pages: Seq[(String, String)], flate: Boolean): Array[Byte] =
    build(pages, if (flate) "flate" else "none")

  /** Filter-parameterized builder twin: `filter` picks the content
    * streams' encoding — "none", "flate", "lzw" (TIFF-layout LZW
    * via the independent [[Multimodal.tiffLzwEncode]]), "ahx-flate"
    * (/Filter [/ASCIIHexDecode /FlateDecode] — the deflate bytes
    * hex-armored, decoded in declaration order) or "a85-rl"
    * (/Filter [/ASCII85Decode /RunLengthDecode]). */
  def build(pages: Seq[(String, String)], filter: String)
      : Array[Byte] = {
    require(pages.nonEmpty && pages.length <= 4096)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    w("%PDF-1.4\n")
    val nPages = pages.length
    val fontObj = 3 + 2 * nPages
    def obj(body: => Unit): Unit = { offsets += out.size(); body }
    obj { w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n") }
    obj {
      val kids = (0 until nPages).map(j => s"${3 + 2 * j} 0 R")
        .mkString(" ")
      w(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $nPages >> " +
        "endobj\n")
    }
    pages.zipWithIndex.foreach { case ((heading, body), j) =>
      val pageNum = 3 + 2 * j
      val contNum = 4 + 2 * j
      obj {
        w(s"$pageNum 0 obj << /Type /Page /Parent 2 0 R " +
          "/MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 $fontObj 0 R >> >> " +
          s"/Contents $contNum 0 R >> endobj\n")
      }
      val half = body.length / 2
      val content = pageContent(heading, body.substring(0, half),
        body.substring(half)).getBytes("ISO-8859-1")
      def deflate(b: Array[Byte]): Array[Byte] = {
        val d = new java.util.zip.Deflater()
        d.setInput(b); d.finish()
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](4096)
        while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
        d.end()
        buf.toByteArray
      }
      val (payload, filterStr) = filter match {
        case "none" => (content, "")
        case "flate" => (deflate(content), " /Filter /FlateDecode")
        case "lzw" => (Multimodal.tiffLzwEncode(content),
          " /Filter /LZWDecode")
        case "ahx-flate" => (ahxEncode(deflate(content)),
          " /Filter [/ASCIIHexDecode /FlateDecode]")
        case "a85-rl" => (a85Encode(rlEncode(content)),
          " /Filter [/ASCII85Decode /RunLengthDecode]")
        case other => sys.error(s"unknown pdf filter mode $other")
      }
      obj {
        w(s"$contNum 0 obj << /Length ${payload.length}$filterStr" +
          " >> stream\n")
        out.write(payload)
        w("\nendstream endobj\n")
      }
    }
    obj {
      w(s"$fontObj 0 obj << /Type /Font /Subtype /Type1 " +
        "/BaseFont /Helvetica >> endobj\n")
    }
    val xrefOff = out.size()
    val n = offsets.length + 1
    w(s"xref\n0 $n\n")
    w("0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer << /Size $n /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** Build the PDF 1.5+ form of the same document: the non-stream
    * objects (catalog, page tree, pages, font) live in ONE
    * /ObjStm object stream, the cross-reference is an /XRef STREAM
    * with W=[1,4,2] typed entries, optionally PNG-Up-predicted
    * (/Predictor 12) — the shape practically every modern PDF writer
    * emits. Content streams stay regular objects (Flate). */
  def buildModern(pages: Seq[(String, String)],
      xrefPredictor: Boolean): Array[Byte] = {
    require(pages.nonEmpty && pages.length <= 4096)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    def flate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
      d.end()
      buf.toByteArray
    }
    val np = pages.length
    // numbering: 1..np content; np+1 catalog; np+2 pages tree;
    // np+3..2np+2 page dicts; 2np+3 font; 2np+4 ObjStm; 2np+5 XRef
    val catalogN = np + 1
    val pagesN = np + 2
    val fontN = 2 * np + 3
    val objStmN = 2 * np + 4
    val xrefN = 2 * np + 5
    w("%PDF-1.5\n")
    val offsets = new Array[Int](xrefN + 1)
    // content streams (regular objects, Flate)
    pages.zipWithIndex.foreach { case ((heading, body), j) =>
      val half = body.length / 2
      val content = pageContent(heading, body.substring(0, half),
        body.substring(half)).getBytes("ISO-8859-1")
      val payload = flate(content)
      offsets(1 + j) = out.size()
      w(s"${1 + j} 0 obj << /Length ${payload.length} " +
        "/Filter /FlateDecode >> stream\n")
      out.write(payload)
      w("\nendstream endobj\n")
    }
    // the object stream holding every dict object
    val members: Seq[(Int, String)] =
      Seq(catalogN -> s"<< /Type /Catalog /Pages $pagesN 0 R >>",
        pagesN -> (s"<< /Type /Pages /Kids [" +
          (0 until np).map(j => s"${np + 3 + j} 0 R").mkString(" ") +
          s"] /Count $np >>")) ++
        (0 until np).map { j =>
          (np + 3 + j) -> (s"<< /Type /Page /Parent $pagesN 0 R " +
            "/MediaBox [0 0 612 792] " +
            s"/Resources << /Font << /F1 $fontN 0 R >> >> " +
            s"/Contents ${1 + j} 0 R >>")
        } ++
        Seq(fontN -> ("<< /Type /Font /Subtype /Type1 " +
          "/BaseFont /Helvetica >>"))
    val bodyParts = scala.collection.mutable.ArrayBuffer.empty[String]
    val header = new StringBuilder
    var bodyOff = 0
    members.foreach { case (num, src) =>
      header.append(s"$num $bodyOff ")
      bodyParts += src + " "
      bodyOff += src.length + 1
    }
    val stmPlain = (header.toString + bodyParts.mkString)
      .getBytes("ISO-8859-1")
    val stmFlate = flate(stmPlain)
    offsets(objStmN) = out.size()
    w(s"$objStmN 0 obj << /Type /ObjStm /N ${members.length} " +
      s"/First ${header.length} /Length ${stmFlate.length} " +
      "/Filter /FlateDecode >> stream\n")
    out.write(stmFlate)
    w("\nendstream endobj\n")
    // the xref stream
    offsets(xrefN) = out.size()
    val entryW = 7 // W = [1, 4, 2]
    val entries = new Array[Byte]((xrefN + 1) * entryW)
    def putEntry(num: Int, tpe: Int, f2: Long, f3: Int): Unit = {
      val o = num * entryW
      entries(o) = tpe.toByte
      entries(o + 1) = ((f2 >>> 24) & 0xff).toByte
      entries(o + 2) = ((f2 >>> 16) & 0xff).toByte
      entries(o + 3) = ((f2 >>> 8) & 0xff).toByte
      entries(o + 4) = (f2 & 0xff).toByte
      entries(o + 5) = ((f3 >>> 8) & 0xff).toByte
      entries(o + 6) = (f3 & 0xff).toByte
    }
    putEntry(0, 0, 0, 0xffff)
    (0 until np).foreach(j => putEntry(1 + j, 1, offsets(1 + j), 0))
    members.zipWithIndex.foreach { case ((num, _), idx) =>
      putEntry(num, 2, objStmN.toLong, idx)
    }
    putEntry(objStmN, 1, offsets(objStmN), 0)
    putEntry(xrefN, 1, offsets(xrefN), 0)
    val xrefBody =
      if (!xrefPredictor) entries
      else {
        // PNG Up filter per row (predictor 12), columns = entryW
        val rows = xrefN + 1
        val outB = new Array[Byte](rows * (entryW + 1))
        var r = 0
        while (r < rows) {
          outB(r * (entryW + 1)) = 2 // Up
          var c = 0
          while (c < entryW) {
            val cur = entries(r * entryW + c) & 0xff
            val up = if (r > 0) entries((r - 1) * entryW + c) & 0xff
              else 0
            outB(r * (entryW + 1) + 1 + c) = ((cur - up) & 0xff).toByte
            c += 1
          }
          r += 1
        }
        outB
      }
    val xrefFlate = flate(xrefBody)
    val parms =
      if (xrefPredictor) s" /DecodeParms << /Predictor 12 /Columns $entryW >>"
      else ""
    w(s"$xrefN 0 obj << /Type /XRef /Size ${xrefN + 1} /W [1 4 2]" +
      parms + s" /Root $catalogN 0 R /Length ${xrefFlate.length} " +
      "/Filter /FlateDecode >> stream\n")
    out.write(xrefFlate)
    w("\nendstream endobj\n")
    w(s"startxref\n${offsets(xrefN)}\n%%EOF\n")
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Lexer
  // ---------------------------------------------------------------

  private object Bad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private final class Lex(val b: Array[Byte], var p: Int) {
    def fail(): Nothing = throw Bad
    private def ws(c: Int): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' ||
        c == 0
    private def delim(c: Int): Boolean =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
        c == ']' || c == '{' || c == '}' || c == '/' || c == '%'
    def skipWs(): Unit = {
      var go = true
      while (go) {
        while (p < b.length && ws(b(p) & 0xff)) p += 1
        if (p < b.length && b(p) == '%') {
          while (p < b.length && b(p) != '\n' && b(p) != '\r') p += 1
        } else go = false
      }
    }
    def peek: Int = if (p < b.length) b(p) & 0xff else -1

    /** Next raw token as a string for keywords/numbers/names. */
    def bareToken(): String = {
      skipWs()
      if (p >= b.length) fail()
      val start = p
      while (p < b.length && !ws(b(p) & 0xff) && !delim(b(p) & 0xff))
        p += 1
      if (p == start) fail()
      new String(b, start, p - start, "ISO-8859-1")
    }

    /** One VALUE (not refs — those are folded by the caller). */
    def value(depth: Int): PVal = {
      if (depth > 48) fail()
      skipWs()
      peek match {
        case -1  => fail()
        case '/' =>
          p += 1
          val start = p
          while (p < b.length && !ws(b(p) & 0xff) && !delim(b(p) & 0xff))
            p += 1
          PName(new String(b, start, p - start, "ISO-8859-1"))
        case '(' => PStr(litString())
        case '<' =>
          if (p + 1 < b.length && b(p + 1) == '<') dict(depth)
          else PStr(hexString())
        case '[' =>
          p += 1
          val vs = Vector.newBuilder[PVal]
          skipWs()
          var n = 0
          while (peek != ']') {
            vs += valueWithRefs(depth + 1)
            skipWs()
            n += 1
            if (n > 65536) fail()
          }
          p += 1
          PArr(vs.result())
        case c if c == '+' || c == '-' || c == '.' ||
            (c >= '0' && c <= '9') =>
          val t = bareToken()
          PNum(java.lang.Double.parseDouble(t))
        case _ =>
          bareToken() match {
            case "true"  => PBool(true)
            case "false" => PBool(false)
            case "null"  => PNull
            case _       => fail()
          }
      }
    }

    /** A value, folding `N G R` reference triples. */
    def valueWithRefs(depth: Int): PVal = {
      val v = value(depth)
      v match {
        case PNum(n) if n >= 0 && n == math.floor(n) =>
          val save = p
          try {
            skipWs()
            val v2 = value(depth)
            v2 match {
              case PNum(g) if g >= 0 && g == math.floor(g) =>
                skipWs()
                val save2 = p
                if (bareToken() == "R") PRef(n.toInt, g.toInt)
                else { p = save2; p = save; v }
              case _ => p = save; v
            }
          } catch { case Bad => p = save; v }
        case _ => v
      }
    }

    private def dict(depth: Int): PVal = {
      p += 2 // <<
      val m = Map.newBuilder[String, PVal]
      skipWs()
      var n = 0
      while (!(peek == '>' && p + 1 < b.length && b(p + 1) == '>')) {
        val k = value(depth + 1) match {
          case PName(x) => x
          case _        => fail()
        }
        m += ((k, valueWithRefs(depth + 1)))
        skipWs()
        n += 1
        if (n > 4096) fail()
      }
      p += 2
      PDict(m.result())
    }

    private def litString(): Array[Byte] = {
      p += 1 // (
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      var n = 0
      while (depth > 0) {
        if (p >= b.length || n > (1 << 20)) fail()
        val c = b(p) & 0xff
        p += 1
        n += 1
        c match {
          case '(' => depth += 1; out.write(c)
          case ')' => depth -= 1; if (depth > 0) out.write(c)
          case '\\' =>
            if (p >= b.length) fail()
            val e = b(p) & 0xff
            p += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('(')
              case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => if (p < b.length && b(p) == '\n') p += 1
              case '\n' => // line continuation: nothing
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && p < b.length && b(p) >= '0' &&
                  b(p) <= '7') {
                  v = v * 8 + (b(p) - '0'); p += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other) // spec: backslash dropped
            }
          case _ => out.write(c)
        }
      }
      out.toByteArray
    }

    private def hexString(): Array[Byte] = {
      p += 1 // <
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var done = false
      while (!done) {
        if (p >= b.length || out.size() > (1 << 20)) fail()
        val c = b(p) & 0xff
        p += 1
        if (c == '>') {
          if (hi >= 0) out.write(hi << 4) // odd count: pad 0
          done = true
        } else if (!ws(c)) {
          val d = Character.digit(c, 16)
          if (d < 0) fail()
          if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
        }
      }
      out.toByteArray
    }
  }

  // ---------------------------------------------------------------
  // Document parse
  // ---------------------------------------------------------------

  /** Extract the document text: pages joined with '\n', text shows
    * within a page joined with ' ' (TJ arrays concatenate). None on
    * anything outside the supported subset. */
  def extractText(data: Array[Byte], maxObjects: Int = 65536)
      : Option[String] =
    try {
      if (!isPdf(data)) return None
      // startxref: search the last 2 KiB
      val tailStr = new String(data,
        math.max(0, data.length - 2048),
        math.min(2048, data.length), "ISO-8859-1")
      val sx = tailStr.lastIndexOf("startxref")
      if (sx < 0) return None
      val lx = new Lex(data, math.max(0, data.length - 2048) + sx + 9)
      val xrefOff = lx.bareToken().toLong
      if (xrefOff < 0 || xrefOff >= data.length) return None
      // xref chain (classic TABLES and PDF 1.5 xref STREAMS) ->
      // object locations + trailer. A location is a direct offset or
      // (object stream, index) for /ObjStm members.
      val offsets = scala.collection.mutable.Map.empty[Int, Int]
      val inStm = scala.collection.mutable.Map.empty[Int, (Int, Int)]
      var trailer: PDict = null
      var next = xrefOff.toInt
      var hops = 0
      while (next >= 0) {
        hops += 1
        if (hops > 32) return None
        val l = new Lex(data, next)
        l.skipWs()
        val t: PDict =
          if (l.peek == 'x') {
            if (l.bareToken() != "xref") return None
            l.skipWs()
            while (l.peek != 't') { // until "trailer"
              val start = l.bareToken().toInt
              val count = l.bareToken().toInt
              if (start < 0 || count < 0 || start + count > maxObjects)
                return None
              var i = 0
              while (i < count) {
                val off = l.bareToken().toLong
                l.bareToken() // generation (no incremental updates)
                val tpe = l.bareToken()
                if (tpe == "n" && !offsets.contains(start + i) &&
                  !inStm.contains(start + i) &&
                  off >= 0 && off < data.length)
                  offsets(start + i) = off.toInt
                else if (tpe != "n" && tpe != "f") return None
                i += 1
              }
              l.skipWs()
            }
            if (l.bareToken() != "trailer") return None
            l.valueWithRefs(0) match {
              case d: PDict => d
              case _        => return None
            }
          } else {
            // xref STREAM: "N G obj << ... >> stream"
            parseXrefStream(data, next, maxObjects, offsets, inStm)
              .getOrElse(return None)
          }
        if (trailer == null) trailer = t
        if (t.m.contains("Encrypt")) return None
        next = t.m.get("Prev") match {
          case Some(PNum(v)) if v >= 0 && v < data.length => v.toInt
          case Some(_) => return None
          case None => -1
        }
      }
      if (trailer == null) return None
      val cache = scala.collection.mutable.Map.empty[Int, PVal]
      def resolve(v: PVal, depth: Int): PVal = {
        if (depth > 32) throw Bad
        v match {
          case PRef(num, _) =>
            cache.getOrElseUpdate(num, {
              offsets.get(num) match {
                case Some(off) => parseObjectAt(data, off, num,
                  x => resolve(x, depth + 1))
                case None =>
                  // an /ObjStm member: decode the container, seek the
                  // member by the N-pair header
                  val (stmNum, idx) = inStm.getOrElse(num, throw Bad)
                  val container = resolve(PRef(stmNum, 0), depth + 1)
                  container match {
                    case s: PStream
                        if s.dict.m.get("Type").contains(PName("ObjStm")) =>
                      val body = decodeStreamBytes(s, x =>
                        resolve(x, depth + 1))
                      val nObjs = s.dict.m.get("N") match {
                        case Some(PNum(x)) if x >= 0 && x <= 65536 =>
                          x.toInt
                        case _ => throw Bad
                      }
                      val first = s.dict.m.get("First") match {
                        case Some(PNum(x)) if x >= 0 && x <= body.length =>
                          x.toInt
                        case _ => throw Bad
                      }
                      if (idx < 0 || idx >= nObjs) throw Bad
                      val hl = new Lex(body, 0)
                      var objOff = -1
                      var i = 0
                      while (i <= idx) {
                        val on = hl.bareToken().toInt
                        val oo = hl.bareToken().toInt
                        if (i == idx) {
                          if (on != num) throw Bad
                          objOff = first + oo
                        }
                        i += 1
                      }
                      if (objOff < 0 || objOff > body.length) throw Bad
                      new Lex(body, objOff).valueWithRefs(0)
                    case _ => throw Bad
                  }
              }
            })
          case _ => v
        }
      }
      def decodeStream(s: PStream): Array[Byte] =
        decodeStreamBytes(s, x => resolve(x, 0))
      // catalog -> pages tree -> page contents
      val root = resolve(trailer.m.getOrElse("Root", throw Bad), 0) match {
        case d: PDict => d
        case _        => throw Bad
      }
      val pagesRoot = resolve(root.m.getOrElse("Pages", throw Bad), 0)
      val pageTexts = Vector.newBuilder[String]
      var nPages = 0
      def walk(node: PVal, depth: Int): Unit = {
        if (depth > 32) throw Bad
        resolve(node, depth) match {
          case d: PDict =>
            d.m.get("Type") match {
              case Some(PName("Pages")) =>
                d.m.get("Kids") match {
                  case Some(PArr(kids)) =>
                    kids.foreach(walk(_, depth + 1))
                  case _ => throw Bad
                }
              case Some(PName("Page")) =>
                nPages += 1
                if (nPages > 4096) throw Bad
                val streams: Seq[Array[Byte]] =
                  d.m.get("Contents") match {
                    case None => Seq.empty
                    case Some(c) => resolve(c, depth + 1) match {
                      case s: PStream => Seq(decodeStream(s))
                      case PArr(cs) => cs.map(x =>
                        resolve(x, depth + 1) match {
                          case s: PStream => decodeStream(s)
                          case _          => throw Bad
                        })
                      case _ => throw Bad
                    }
                  }
                val whole = streams.foldLeft(Array.emptyByteArray)(_ ++ _)
                pageTexts += contentText(whole)
              case _ => throw Bad
            }
          case _ => throw Bad
        }
      }
      walk(pagesRoot, 0)
      Some(pageTexts.result().mkString("\n"))
    } catch {
      case Bad => None
      case _: NumberFormatException => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  /** Parse the indirect object at `off` (expected number `num`),
    * including an attached stream (length resolved via `resolve`). */
  private def parseObjectAt(data: Array[Byte], off: Int, num: Int,
      resolve: PVal => PVal): PVal = {
    val l = new Lex(data, off)
    if (l.bareToken().toInt != num) throw Bad
    l.bareToken() // gen
    if (l.bareToken() != "obj") throw Bad
    val body = l.valueWithRefs(0)
    l.skipWs()
    val save = l.p
    val kw = try l.bareToken() catch { case Bad => "" }
    if (kw == "stream") {
      val d = body match {
        case x: PDict => x
        case _        => throw Bad
      }
      // EOL after `stream`: CRLF or LF
      var q = l.p
      if (q < data.length && data(q) == '\r') q += 1
      if (q < data.length && data(q) == '\n') q += 1
      val len = resolve(d.m.getOrElse("Length", throw Bad)) match {
        case PNum(x) if x >= 0 && x <= (1 << 24) => x.toInt
        case _ => throw Bad
      }
      if (q + len > data.length) throw Bad
      PStream(d, java.util.Arrays.copyOfRange(data, q, q + len))
    } else { l.p = save; body }
  }

  /** Decode a stream's bytes: the closed-form PDF filter set —
    * FlateDecode, LZWDecode (MSB-first 9→12-bit codes, /EarlyChange
    * 0 or 1), ASCIIHexDecode, ASCII85Decode, RunLengthDecode —
    * singly or as a /Filter ARRAY chain applied in declaration
    * order with per-filter /DecodeParms, plus the PNG predictors
    * (/Predictor ≥ 10 at bpp 1) Flate/LZW streams commonly carry.
    * DCT/JPX/CCITT/JBIG2 (image codecs, irrelevant to text
    * extraction) and Crypt reject. */
  private def decodeStreamBytes(s: PStream,
      resolve: PVal => PVal): Array[Byte] = {
    val filters: List[PVal] =
      resolve(s.dict.m.getOrElse("Filter", PNull)) match {
        case PNull => Nil
        case n: PName => List(n)
        case PArr(vs) =>
          if (vs.length > 8) throw Bad
          vs.toList.map(resolve)
        case _ => throw Bad
      }
    val parms: List[PVal] =
      resolve(s.dict.m.getOrElse("DecodeParms", PNull)) match {
        case PNull => List.fill(filters.length)(PNull)
        case d: PDict =>
          if (filters.length == 1) List(d) else throw Bad
        case PArr(vs) if vs.length == filters.length =>
          vs.toList.map(resolve)
        case _ => throw Bad
      }
    filters.zip(parms).foldLeft(s.raw) { case (data, (f, pm)) =>
      applyFilter(f, pm, data, resolve)
    }
  }

  private def applyFilter(f: PVal, pm: PVal, data: Array[Byte],
      resolve: PVal => PVal): Array[Byte] = {
    val parms: Map[String, PVal] = pm match {
      case PNull => Map.empty
      case d: PDict => d.m
      case _ => throw Bad
    }
    def intParm(k: String, dflt: Int): Int =
      resolve(parms.getOrElse(k, PNull)) match {
        case PNull => dflt
        case PNum(x) => x.toInt
        case _ => throw Bad
      }
    val out = f match {
      case PName("FlateDecode") => inflateBytes(data)
      case PName("LZWDecode") =>
        val ec = intParm("EarlyChange", 1)
        if (ec != 0 && ec != 1) throw Bad
        lzwDecodeBytes(data, ec)
      case PName("ASCIIHexDecode") => asciiHexDecode(data)
      case PName("ASCII85Decode") => ascii85Decode(data)
      case PName("RunLengthDecode") => runLengthDecode(data)
      case _ => throw Bad // image codecs / Crypt: honest rejection
    }
    val pred = intParm("Predictor", 1)
    if (pred == 1) out
    else if (pred >= 10 && pred <= 15 &&
      (f == PName("FlateDecode") || f == PName("LZWDecode"))) {
      // bpp must stay 1 (the xref-stream shape): defaults only
      if (intParm("Colors", 1) != 1 ||
        intParm("BitsPerComponent", 8) != 8) throw Bad
      val cols = intParm("Columns", 1)
      if (cols < 1 || cols > 65536) throw Bad
      pngDefilter(out, cols)
    } else throw Bad // TIFF predictor 2: not emitted for xref
  }

  private def inflateBytes(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) throw Bad
        out.write(buf, 0, n)
        if (out.size() > (1 << 26)) throw Bad
      }
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => throw Bad
    } finally inf.end()
  }

  /** PDF LZW (ISO 32000-1 §7.4.4 = TIFF 6.0 §13 bit layout):
    * MSB-first codes, 9-bit initial width, Clear 256 / EOD 257,
    * table cap 4096; with /EarlyChange 1 (the default) the width
    * bumps one code early (next free slot reaching 2^w − 1), with
    * 0 at exactly 2^w. Differential-tested in PdfSpec against the
    * independent TIFF encoder in [[Multimodal.tiffLzwEncode]]. */
  private[operators] def lzwDecodeBytes(data: Array[Byte],
      earlyChange: Int): Array[Byte] = {
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new java.io.ByteArrayOutputStream()
    var width = 9
    var next = 258
    var prev = -1
    var bitPos = 0L
    val nBits = data.length.toLong * 8
    def read(): Int = {
      if (bitPos + width > nBits) return -1
      var v = 0
      var i = 0
      while (i < width) {
        val bp = bitPos + i
        v = (v << 1) |
          (((data((bp >> 3).toInt) & 0xff) >>> (7 - (bp & 7).toInt)) & 1)
        i += 1
      }
      bitPos += width
      v
    }
    def emitChain(code: Int): Unit = {
      // expand via the chain; depth bounded by table size
      val stack = new Array[Byte](4096)
      var sp = 0
      var c = code
      while (c >= 258) {
        stack(sp) = suffix(c); sp += 1; c = prefix(c)
      }
      out.write(c)
      while (sp > 0) { sp -= 1; out.write(stack(sp)) }
      if (out.size() > (1 << 26)) throw Bad
    }
    var code = read()
    // leading Clears are legal; most writers emit exactly one
    while (code == 256) code = read()
    if (code == 257) return out.toByteArray
    if (code < 0 || code > 255) throw Bad
    out.write(code)
    prev = code
    var done = false
    while (!done) {
      // width bump happens BEFORE reading the next code when the
      // next free slot crosses the boundary
      if (width < 12 &&
        next + (if (earlyChange == 1) 1 else 0) >= (1 << width))
        width += 1
      code = read()
      if (code < 0) throw Bad // bits exhausted before EOD
      else if (code == 257) done = true
      else if (code == 256) {
        width = 9; next = 258; prev = -1
        var c2 = read()
        while (c2 == 256) c2 = read()
        if (c2 == 257) done = true
        else if (c2 < 0 || c2 > 255) throw Bad
        else { out.write(c2); prev = c2 }
      } else {
        if (code > next || (code >= 258 && code == next && prev < 0))
          throw Bad
        if (next < 4096 && prev >= 0) {
          // new entry: prev ++ first-byte-of(code); for the KwKwK
          // case (code == next) the first byte is prev's own
          var c = if (code == next) prev else code
          while (c >= 258) c = prefix(c)
          prefix(next) = prev
          suffix(next) = c.toByte
          next += 1
        } else if (prev >= 0 && code == next) throw Bad
        emitChain(code)
        prev = code
      }
    }
    out.toByteArray
  }

  /** ASCIIHexDecode: hex pairs, PDF whitespace skipped, `>` is EOD,
    * an odd trailing digit is padded with 0. */
  private[operators] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      val d = Character.digit(c, 16)
      if (c == '>') done = true
      else if (c == ' ' || c == '\t' || c == '\r' || c == '\n' ||
        c == '\f' || c == 0) ()
      else if (d >= 0) {
        if (hi < 0) hi = d
        else { out.write((hi << 4) | d); hi = -1 }
      } else throw Bad
      i += 1
    }
    if (!done) throw Bad // the EOD marker is required
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  /** ASCII85Decode: 5 chars '!'..'u' → u32 → 4 bytes; 'z' alone is
    * a zero group; `~>` is EOD; a partial group of n chars pads
    * with 'u' and emits n − 1 bytes. */
  private[operators] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val grp = new Array[Int](5)
    var n = 0
    var i = 0
    var done = false
    def flush(count: Int): Unit = {
      var j = n
      while (j < 5) { grp(j) = 84; j += 1 } // pad with 'u'
      var v = 0L
      j = 0
      while (j < 5) { v = v * 85 + grp(j); j += 1 }
      if (v > 0xffffffffL) throw Bad
      var k = 0
      while (k < count) { out.write(((v >>> (24 - 8 * k)) & 0xff).toInt); k += 1 }
      if (out.size() > (1 << 26)) throw Bad
      n = 0
    }
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '~') {
        if (i + 1 >= data.length || data(i + 1) != '>') throw Bad
        done = true
      } else if (c == ' ' || c == '\t' || c == '\r' || c == '\n' ||
        c == '\f' || c == 0) ()
      else if (c == 'z') {
        if (n != 0) throw Bad // z only between groups
        out.write(0); out.write(0); out.write(0); out.write(0)
        if (out.size() > (1 << 26)) throw Bad // bomb cap
      } else if (c >= '!' && c <= 'u') {
        grp(n) = c - '!'; n += 1
        if (n == 5) flush(4)
      } else throw Bad
      i += 1
    }
    if (!done) throw Bad
    if (n == 1) throw Bad // a lone trailing char is malformed
    if (n > 1) { val count = n - 1; flush(count) }
    out.toByteArray
  }

  /** RunLengthDecode: length byte 0..127 copies the next len+1
    * bytes, 129..255 repeats the next byte 257−len times, 128 is
    * EOD (required). */
  private[operators] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (true) {
      if (i >= data.length) throw Bad
      val l = data(i) & 0xff
      i += 1
      if (l == 128) return out.toByteArray
      else if (l < 128) {
        if (i + l + 1 > data.length) throw Bad
        out.write(data, i, l + 1)
        i += l + 1
      } else {
        if (i >= data.length) throw Bad
        val b = data(i) & 0xff
        i += 1
        var k = 257 - l
        while (k > 0) { out.write(b); k -= 1 }
      }
      if (out.size() > (1 << 26)) throw Bad
    }
    out.toByteArray // unreachable
  }

  /** PNG row defilter at bpp=1 (the xref-stream shape): each row is
    * [filterType][cols bytes]; all five filter types supported. */
  private def pngDefilter(raw: Array[Byte], cols: Int): Array[Byte] = {
    if (raw.length % (cols + 1) != 0) throw Bad
    val rows = raw.length / (cols + 1)
    val out = new Array[Byte](rows * cols)
    var r = 0
    while (r < rows) {
      val ft = raw(r * (cols + 1)) & 0xff
      var c = 0
      while (c < cols) {
        val x = raw(r * (cols + 1) + 1 + c) & 0xff
        val a = if (c > 0) out(r * cols + c - 1) & 0xff else 0
        val b = if (r > 0) out((r - 1) * cols + c) & 0xff else 0
        val pc = if (r > 0 && c > 0) out((r - 1) * cols + c - 1) & 0xff
          else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 =>
            val p = a + b - pc
            val pa = math.abs(p - a)
            val pb = math.abs(p - b)
            val pcc = math.abs(p - pc)
            x + (if (pa <= pb && pa <= pcc) a
              else if (pb <= pcc) b else pc)
          case _ => throw Bad
        }
        out(r * cols + c) = (v & 0xff).toByte
        c += 1
      }
      r += 1
    }
    out
  }

  /** Parse a PDF 1.5 cross-reference STREAM at `off`: W-array typed
    * entries fill `offsets` (type 1) and `inStm` (type 2); returns
    * the stream dict (it IS the trailer). */
  private def parseXrefStream(data: Array[Byte], off: Int,
      maxObjects: Int, offsets: scala.collection.mutable.Map[Int, Int],
      inStm: scala.collection.mutable.Map[Int, (Int, Int)])
      : Option[PDict] =
    try {
      // /Length must be direct here (nothing is resolvable yet)
      val obj = parseObjectAt(data, off, {
        new Lex(data, off).bareToken().toInt
      }, {
        case n: PNum => n
        case _       => throw Bad
      })
      val s = obj match {
        case x: PStream
            if x.dict.m.get("Type").contains(PName("XRef")) => x
        case _ => throw Bad
      }
      val body = decodeStreamBytes(s, {
        case n: PNum => n
        case PNull   => PNull
        case d: PDict => d
        case n: PName => n
        case a: PArr => a
        case _       => throw Bad // refs: an xref stream's own
        // filter chain must be self-contained (no objects resolvable
        // before it decodes)
      })
      val w = s.dict.m.get("W") match {
        case Some(PArr(Vector(PNum(a), PNum(b), PNum(c))))
            if a >= 0 && a <= 4 && b >= 1 && b <= 8 && c >= 0 && c <= 4 =>
          (a.toInt, b.toInt, c.toInt)
        case _ => throw Bad
      }
      val size = s.dict.m.get("Size") match {
        case Some(PNum(x)) if x >= 0 && x <= maxObjects => x.toInt
        case _ => throw Bad
      }
      val index: Seq[(Int, Int)] = s.dict.m.get("Index") match {
        case None => Seq((0, size))
        case Some(PArr(vs)) if vs.length % 2 == 0 && vs.length <= 128 =>
          vs.grouped(2).map {
            case Vector(PNum(a), PNum(b))
                if a >= 0 && b >= 0 && a + b <= maxObjects =>
              (a.toInt, b.toInt)
            case _ => throw Bad
          }.toSeq
        case _ => throw Bad
      }
      val entryW = w._1 + w._2 + w._3
      var p = 0
      def field(n: Int): Long = {
        var v = 0L
        var i = 0
        while (i < n) { v = (v << 8) | (body(p) & 0xffL); p += 1; i += 1 }
        v
      }
      index.foreach { case (start, count) =>
        var i = 0
        while (i < count) {
          if (p + entryW > body.length) throw Bad
          val tpe = if (w._1 == 0) 1L else field(w._1)
          val f2 = field(w._2)
          val f3 = field(w._3)
          locally(f3)
          val num = start + i
          tpe match {
            case 0 => // free
            case 1 =>
              if (!offsets.contains(num) && !inStm.contains(num) &&
                f2 >= 0 && f2 < data.length) offsets(num) = f2.toInt
            case 2 =>
              if (!offsets.contains(num) && !inStm.contains(num) &&
                f2 >= 0 && f2 <= maxObjects && f3 >= 0 && f3 <= 65536)
                inStm(num) = (f2.toInt, f3.toInt)
            case _ => throw Bad
          }
          i += 1
        }
      }
      Some(s.dict)
    } catch {
      case Bad => None
      case _: NumberFormatException => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  /** Walk one page's content stream for the text-show operators. */
  private def contentText(content: Array[Byte]): String = {
    val l = new Lex(content, 0)
    val shows = Vector.newBuilder[String]
    val operands = scala.collection.mutable.ArrayBuffer.empty[PVal]
    def strOf(v: PVal): String = v match {
      case PStr(bs) => new String(bs, "ISO-8859-1")
      case _        => ""
    }
    var steps = 0
    var done = false
    while (!done) {
      l.skipWs()
      steps += 1
      if (steps > (1 << 20)) throw Bad
      if (l.peek == -1) done = true
      else {
        val c = l.peek
        if (c == '/' || c == '(' || c == '<' || c == '[' ||
          c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
          operands += l.value(0)
        } else l.bareToken() match {
          case "Tj" | "'" =>
            if (operands.nonEmpty) shows += strOf(operands.last)
            operands.clear()
          case "\"" =>
            if (operands.nonEmpty) shows += strOf(operands.last)
            operands.clear()
          case "TJ" =>
            operands.lastOption match {
              case Some(PArr(vs)) =>
                shows += vs.collect { case PStr(bs) =>
                  new String(bs, "ISO-8859-1") }.mkString
              case _ =>
            }
            operands.clear()
          case "BI" =>
            throw Bad // inline images: out of subset
          case _ =>
            operands.clear() // any other operator consumes its operands
        }
      }
    }
    shows.result().filter(_.nonEmpty).mkString(" ")
  }
}
