package graft.operators

/** Internet mail (RFC 5322 headers + MIME, RFCs 2045-2047) — mail
  * archives (mailing lists, support corpora) are a standard text-
  * corpus source and arrive as `.eml` files or `mbox` spools.
  * Pure-JVM, both directions, entirely closed-form:
  *
  *  - header block parse with FOLDING (continuation lines), case-
  *    insensitive names, repeated headers kept in order;
  *  - Content-Type parameter parse (quoted and bare values —
  *    boundary, charset, name);
  *  - transfer decodings: 7bit/8bit/binary (raw), QUOTED-PRINTABLE
  *    (=XX, soft line breaks, trailing-space stripping) and BASE64
  *    (the JDK's lenient MIME decoder);
  *  - nested MULTIPART walking (boundary lines, the closing
  *    `--boundary--`, preamble/epilogue dropped, depth ≤ 8);
  *  - charset decode for text parts (any charset the JVM knows;
  *    unknown ones fall back to ISO-8859-1 rather than dropping the
  *    part);
  *  - the MBOX spool walk (`From ` separator lines at message start,
  *    `>From ` unescaping per mboxrd).
  *
  * The builder emits deterministic messages (fixed header order,
  * deterministic QP/base64 wrapping), so gate fixtures reconstruct
  * analytically. Malformed structures degrade the way real mail
  * tooling does — an unterminated multipart yields the parts seen so
  * far; a bad QP escape passes through literally — but the walk
  * never throws and never invents content. No bundled JVM MIME
  * implementation exists to differential against (jakarta.mail is
  * not shipped); validation is RFC-example pins, round trips and
  * fuzz in MimeSpec plus the `eml_parse` gate. */
object Mime {

  /** One leaf part: media type, charset (for text parts), decoded body. */
  final case class Part(mediaType: String, charset: String,
      data: Array[Byte]) {
    def text: String = new String(data, charsetOrLatin1(charset))
  }

  final case class Message(headers: Seq[(String, String)],
      parts: Seq[Part]) {
    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
  }

  private def charsetOrLatin1(name: String): java.nio.charset.Charset =
    try java.nio.charset.Charset.forName(name)
    catch { case _: Exception =>
      java.nio.charset.StandardCharsets.ISO_8859_1 }

  // ---------------------------------------------------------------
  // Encodings
  // ---------------------------------------------------------------

  /** Quoted-printable encode (RFC 2045 §6.7): deterministic 76-char
    * soft-wrapped lines; space/tab kept except line-final. */
  def qpEncode(data: Array[Byte]): String = {
    val sb = new StringBuilder
    var lineLen = 0
    def emit(s: String): Unit = {
      if (lineLen + s.length > 75) { sb.append("=\r\n"); lineLen = 0 }
      sb.append(s)
      lineLen += s.length
    }
    var i = 0
    while (i < data.length) {
      val c = data(i) & 0xff
      if (c == '\n') { sb.append("\r\n"); lineLen = 0 }
      else if (c == '\r') { /* normalized below: builder uses \n */ }
      else if (c == '=' || c < 32 || c > 126) emit(f"=$c%02X")
      else if ((c == ' ' || c == '\t') &&
        (i + 1 >= data.length || data(i + 1) == '\n')) emit(f"=$c%02X")
      else emit(c.toChar.toString)
      i += 1
    }
    sb.toString
  }

  /** Quoted-printable decode; bad escapes pass through literally
    * (the tolerant-reader convention real mail tools follow). */
  def qpDecode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\r' &&
          i + 2 < s.length && s.charAt(i + 2) == '\n') i += 3 // soft
        else if (i + 1 < s.length && s.charAt(i + 1) == '\n') i += 2
        else if (i + 2 < s.length) {
          val hi = Character.digit(s.charAt(i + 1), 16)
          val lo = Character.digit(s.charAt(i + 2), 16)
          if (hi >= 0 && lo >= 0) { out.write((hi << 4) | lo); i += 3 }
          else { out.write('='); i += 1 }
        } else { out.write('='); i += 1 }
      } else if (c == '\r') i += 1 // CRLF -> \n
      else { out.write(c & 0xff); i += 1 }
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Builder
  // ---------------------------------------------------------------

  /** A deterministic multipart/mixed message: a QP text/plain part,
    * a base64 text/html part, and optional binary attachments. */
  def buildMessage(from: String, subject: String, plain: String,
      html: String, attachments: Seq[(String, Array[Byte])],
      boundary: String): String = {
    val sb = new StringBuilder
    def h(k: String, v: String): Unit =
      sb.append(k).append(": ").append(v).append("\r\n")
    h("From", from)
    h("Subject", subject)
    h("MIME-Version", "1.0")
    h("Content-Type", s"""multipart/mixed; boundary="$boundary"""")
    sb.append("\r\n")
    sb.append("preamble is ignored\r\n")
    sb.append(s"--$boundary\r\n")
    h("Content-Type", "text/plain; charset=utf-8")
    h("Content-Transfer-Encoding", "quoted-printable")
    sb.append("\r\n")
    sb.append(qpEncode(plain.getBytes("UTF-8"))).append("\r\n")
    sb.append(s"--$boundary\r\n")
    h("Content-Type", "text/html; charset=utf-8")
    h("Content-Transfer-Encoding", "base64")
    sb.append("\r\n")
    sb.append(java.util.Base64.getMimeEncoder(76,
      "\r\n".getBytes).encodeToString(html.getBytes("UTF-8")))
    sb.append("\r\n")
    attachments.foreach { case (name, data) =>
      sb.append(s"--$boundary\r\n")
      h("Content-Type", "application/octet-stream")
      h("Content-Disposition", s"""attachment; filename="$name"""")
      h("Content-Transfer-Encoding", "base64")
      sb.append("\r\n")
      sb.append(java.util.Base64.getMimeEncoder(76,
        "\r\n".getBytes).encodeToString(data)).append("\r\n")
    }
    sb.append(s"--$boundary--\r\n")
    sb.append("epilogue is ignored\r\n")
    sb.toString
  }

  /** An mbox spool from raw messages: `From ` separators, mboxrd
    * `>From` escaping of body lines. */
  def buildMbox(messages: Seq[String]): String =
    messages.map { m =>
      "From corpus@localhost Thu Jan  1 00:00:00 1970\n" +
        m.linesWithSeparators.map { line =>
          if (line.stripLineEnd.matches("^>*From .*")) ">" + line
          else line
        }.mkString
    }.mkString("", "\n", "\n")

  // ---------------------------------------------------------------
  // Parser
  // ---------------------------------------------------------------

  /** Parse a full message: header block + (possibly nested) body. */
  def parseMessage(raw: String): Message = {
    val (headers, body) = splitHeaders(raw)
    Message(headers, parseBody(headers, body, 0))
  }

  /** Header block with folding; returns (headers, body-after-blank). */
  private def splitHeaders(raw: String): (Seq[(String, String)], String) = {
    val norm = raw.replace("\r\n", "\n")
    val blank = norm.indexOf("\n\n")
    val (head, body) =
      if (blank < 0) (norm, "")
      else (norm.substring(0, blank), norm.substring(blank + 2))
    val out = Seq.newBuilder[(String, String)]
    var cur: (String, StringBuilder) = null
    head.split("\n", -1).foreach { line =>
      if (line.nonEmpty && (line.charAt(0) == ' ' ||
        line.charAt(0) == '\t')) {
        if (cur != null) cur._2.append(' ').append(line.trim)
      } else {
        if (cur != null) out += ((cur._1, cur._2.toString))
        val colon = line.indexOf(':')
        cur =
          if (colon <= 0) null // malformed header line: dropped
          else (line.substring(0, colon).trim,
            new StringBuilder(line.substring(colon + 1).trim))
      }
    }
    if (cur != null) out += ((cur._1, cur._2.toString))
    (out.result(), body)
  }

  /** Content-Type value + params: `type/sub; k=v; k2="v2"`. */
  private[operators] def contentTypeOf(
      headers: Seq[(String, String)]): (String, Map[String, String]) = {
    val raw = headers.collectFirst {
      case (k, v) if k.equalsIgnoreCase("Content-Type") => v
    }.getOrElse("text/plain; charset=us-ascii")
    // quote-aware ';' split: ';' is a tspecial, legal INSIDE a quoted
    // parameter value per RFC 2045 — boundary="a;b" is one parameter,
    // not two. Quoted-pair (\x) is honoured so \" does not end the
    // quoted string.
    val segsB = Seq.newBuilder[String]
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (inQ && c == '\\' && i + 1 < raw.length) {
        sb += c; sb += raw.charAt(i + 1); i += 1
      } else if (c == '"') { inQ = !inQ; sb += c }
      else if (c == ';' && !inQ) { segsB += sb.toString; sb.clear() }
      else sb += c
      i += 1
    }
    segsB += sb.toString
    val segs = segsB.result()
    val mt = segs.head.trim.toLowerCase
    val params = segs.tail.flatMap { s =>
      val eq = s.indexOf('=')
      if (eq <= 0) None
      else {
        val k = s.substring(0, eq).trim.toLowerCase
        var v = s.substring(eq + 1).trim
        if (v.length >= 2 && v.startsWith("\"") && v.endsWith("\"")) {
          v = v.substring(1, v.length - 1)
          // undo quoted-pair escapes inside the quoted string
          if (v.contains('\\')) {
            val ub = new StringBuilder
            var j = 0
            while (j < v.length) {
              if (v.charAt(j) == '\\' && j + 1 < v.length) {
                ub += v.charAt(j + 1); j += 2
              } else { ub += v.charAt(j); j += 1 }
            }
            v = ub.toString
          }
        }
        Some(k -> v)
      }
    }.toMap
    (mt, params)
  }

  private def decodeTransfer(headers: Seq[(String, String)],
      body: String): Array[Byte] = {
    val enc = headers.collectFirst {
      case (k, v) if k.equalsIgnoreCase("Content-Transfer-Encoding") =>
        v.trim.toLowerCase
    }.getOrElse("7bit")
    enc match {
      case "quoted-printable" => qpDecode(body)
      case "base64" =>
        try java.util.Base64.getMimeDecoder.decode(
          body.filter(c => !c.isWhitespace))
        catch { case _: IllegalArgumentException =>
          Array.emptyByteArray }
      case _ => body.replace("\r\n", "\n").getBytes("ISO-8859-1")
    }
  }

  private def parseBody(headers: Seq[(String, String)], body: String,
      depth: Int): Seq[Part] = {
    if (depth > 8) return Seq.empty
    val (mt, params) = contentTypeOf(headers)
    if (mt.startsWith("multipart/")) {
      params.get("boundary") match {
        case None => Seq.empty
        case Some(b) =>
          val norm = body.replace("\r\n", "\n")
          val lines = norm.split("\n", -1)
          val parts = Seq.newBuilder[Seq[String]]
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          var in = false
          var closed = false
          lines.foreach { line =>
            if (!closed) {
              // RFC 2046: boundary lines may carry trailing WSP
              val t = line.replaceAll("[ \t]+$", "")
              if (t == s"--$b") {
                if (in) { parts += buf.toSeq; buf.clear() }
                in = true
              } else if (t == s"--$b--") {
                if (in) { parts += buf.toSeq; buf.clear() }
                in = false
                closed = true
              } else if (in) buf += line
            }
          }
          if (in && buf.nonEmpty) parts += buf.toSeq // unterminated
          parts.result().flatMap { pl =>
            val sub = pl.mkString("\n")
            val (ph, pb) = splitHeaders(sub)
            parseBody(ph, pb, depth + 1)
          }
      }
    } else {
      val data = decodeTransfer(headers, body)
      val charset = params.getOrElse("charset", "us-ascii")
      Seq(Part(mt, charset, data))
    }
  }

  /** Split an mbox spool into raw messages (mboxrd unescaping). */
  def parseMbox(spool: String): Seq[String] = {
    val norm = spool.replace("\r\n", "\n")
    val out = Seq.newBuilder[String]
    var cur: StringBuilder = null
    norm.split("\n", -1).foreach { line =>
      if (line.startsWith("From ")) {
        if (cur != null) out += cur.toString.stripLineEnd
        cur = new StringBuilder
      } else if (cur != null) {
        val unescaped =
          if (line.matches("^>+From .*")) line.substring(1) else line
        cur.append(unescaped).append('\n')
      }
    }
    if (cur != null) out += cur.toString.stripLineEnd
    out.result()
  }
}
