package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC (ISO 28500) container build + parse in pure JVM — the Common
  * Crawl ingestion path for a web-scale training-data pipeline. A WARC
  * file is a concatenation of records, each a block of CRLF-terminated
  * named headers, a blank line, `Content-Length` bytes of payload
  * (for `WARC-Type: response` an HTTP response envelope), and a
  * `\r\n\r\n` record separator. The production `.warc.gz` layout gzips
  * EVERY RECORD AS ITS OWN MEMBER and concatenates the members, so a
  * reader can split archives at member boundaries; `GZIPInputStream`
  * reads concatenated members natively, which keeps the decompression
  * path one stream walk.
  *
  * Parsing is strict-but-skipping: a record whose version line or
  * `Content-Length` is malformed ends the walk (a torn tail must not
  * invent records), while a well-formed record with a non-HTTP payload
  * simply reports status −1.
  */
object Warc {

  private val Crlf = "\r\n"

  /** One WARC/1.0 response record wrapping `body` as an HTTP 200
    * text/plain response. Deterministic: no dates or uuids beyond the
    * doc-derived record id, so tests and oracles can predict every
    * byte. */
  def buildRecord(docId: Long, uri: String, body: Array[Byte]): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK${Crlf}Content-Type: text/plain$Crlf" +
      s"Content-Length: ${body.length}$Crlf$Crlf").getBytes("UTF-8") ++ body
    val hdr = (s"WARC/1.0${Crlf}WARC-Type: response$Crlf" +
      s"WARC-Target-URI: $uri$Crlf" +
      s"WARC-Record-ID: <urn:graft:$docId>$Crlf" +
      s"Content-Type: application/http; msgtype=response$Crlf" +
      s"Content-Length: ${http.length}$Crlf$Crlf").getBytes("UTF-8")
    hdr ++ http ++ s"$Crlf$Crlf".getBytes("UTF-8")
  }

  /** One WET-style `conversion` record (the Common Crawl text
    * derivative: extracted text as the record body directly, no
    * HTTP envelope). */
  def buildConversionRecord(docId: Long, uri: String,
      text: String): Array[Byte] = {
    val body = text.getBytes("UTF-8")
    val hdr = (s"WARC/1.0${Crlf}WARC-Type: conversion$Crlf" +
      s"WARC-Target-URI: $uri$Crlf" +
      s"WARC-Record-ID: <urn:graft:wet:$docId>$Crlf" +
      s"WARC-Refers-To: <urn:graft:$docId>$Crlf" +
      s"Content-Type: text/plain$Crlf" +
      s"Content-Length: ${body.length}$Crlf$Crlf").getBytes("UTF-8")
    hdr ++ body ++ s"$Crlf$Crlf".getBytes("UTF-8")
  }

  /** One WAT-style `metadata` record (the Common Crawl metadata
    * derivative: a JSON envelope as the record body). */
  def buildMetadataRecord(docId: Long, uri: String,
      json: String): Array[Byte] = {
    val body = json.getBytes("UTF-8")
    val hdr = (s"WARC/1.0${Crlf}WARC-Type: metadata$Crlf" +
      s"WARC-Target-URI: $uri$Crlf" +
      s"WARC-Record-ID: <urn:graft:wat:$docId>$Crlf" +
      s"WARC-Refers-To: <urn:graft:$docId>$Crlf" +
      s"Content-Type: application/json$Crlf" +
      s"Content-Length: ${body.length}$Crlf$Crlf").getBytes("UTF-8")
    hdr ++ body ++ s"$Crlf$Crlf".getBytes("UTF-8")
  }

  /** Concatenate records into one archive; `gzip = true` produces the
    * `.warc.gz` layout (one gzip member per record, members
    * concatenated). */
  def buildArchive(records: Seq[Array[Byte]], gzip: Boolean): Array[Byte] =
    if (!gzip) {
      val out = new ByteArrayOutputStream()
      records.foreach(out.write)
      out.toByteArray
    } else {
      val out = new ByteArrayOutputStream()
      records.foreach { r =>
        val gz = new GZIPOutputStream(out)
        gz.write(r); gz.finish()
      }
      out.toByteArray
    }

  /** Parsed facts of one record: enough to identify, route and
    * fingerprint the payload without carrying it (`bodyOff` indexes
    * into the decompressed archive for consumers that do want it;
    * `recOff`/`recLen` frame the WHOLE record — header block through
    * trailing CRLFCRLF — which is exactly what a CDX index stores so
    * a replay can seek straight to the record). */
  final case class WarcRecord(uri: String, warcType: String,
      contentLength: Long, httpStatus: Int, bodyLen: Long, bodyMd5: String,
      bodyOff: Int, recOff: Int = 0, recLen: Int = 0)

  private def md5hex(b: Array[Byte], off: Int, len: Int): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.update(b, off, len)
    d.digest().map("%02x".format(_)).mkString
  }

  /** Walk an archive — plain or multi-member gzip (sniffed by the
    * 0x1f8b magic) — and parse every record until the bytes run out or
    * a malformed header block ends the walk. */
  def parseArchive(bytes: Array[Byte]): Seq[WarcRecord] =
    walk(bytes)._1

  /** The ingest-pipeline form: (target URI, payload body as UTF-8) per
    * record — what a WARC → extract → gate DAG consumes. */
  def parseArchiveBodies(bytes: Array[Byte]): Seq[(String, String)] = {
    val (recs, plain) = walk(bytes)
    recs.map(r => r.uri ->
      new String(plain, r.bodyOff, r.bodyLen.toInt, "UTF-8"))
  }

  private def walk(bytes: Array[Byte]): (Seq[WarcRecord], Array[Byte]) = {
    val plain =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
        (bytes(1) & 0xff) == 0x8b) {
        val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
        val out = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } else if (Zstd.isZstd(bytes))
        // the `.warc.zst` layout (Common Crawl's newer transport):
        // one zstd frame per record, frames concatenated — exactly
        // the concatenated-frame shape operators/Zstd decodes.
        // Dictionary-bearing variants reject there (no dict supplied),
        // which ends the walk with zero records — drop, never invent.
        Zstd.decode(bytes).getOrElse(Array.emptyByteArray)
      else bytes
    val recs = Seq.newBuilder[WarcRecord]
    var p = 0
    var ok = true
    while (ok && p < plain.length) {
      // header block: CRLF-terminated lines up to a blank line
      val blockEnd = indexOfCrlfCrlf(plain, p)
      if (blockEnd < 0) ok = false
      else {
        val lines = new String(plain, p, blockEnd - p, "UTF-8").split("\r\n")
        if (lines.isEmpty || !lines(0).startsWith("WARC/")) ok = false
        else {
          val hdrs = lines.drop(1).flatMap { l =>
            val i = l.indexOf(':')
            if (i < 0) None
            else Some(l.substring(0, i).trim.toLowerCase ->
              l.substring(i + 1).trim)
          }.toMap
          hdrs.get("content-length").flatMap(_.toLongOption) match {
            case None => ok = false
            case Some(cl)
              if cl < 0 || blockEnd + 4 + cl > plain.length => ok = false
            case Some(cl) =>
              val payloadOff = blockEnd + 4
              val clInt = cl.toInt
              // HTTP envelope: status line + headers + blank + body
              val httpEnd = indexOfCrlfCrlf(plain, payloadOff)
              val (status, bodyOff) =
                if (httpEnd >= 0 && httpEnd < payloadOff + cl &&
                  new String(plain, payloadOff,
                    math.min(5, clInt), "UTF-8").startsWith("HTTP/")) {
                  val statusLine = new String(plain, payloadOff,
                    httpEnd - payloadOff, "UTF-8").split("\r\n")(0)
                  val st = statusLine.split(" ", 3) match {
                    case Array(_, code, _*) => code.toIntOption.getOrElse(-1)
                    case _ => -1
                  }
                  (st, httpEnd + 4)
                } else (-1, payloadOff)
              val bodyLen = payloadOff + clInt - bodyOff
              val recOff = p
              // record separator after the payload
              p = payloadOff + clInt
              if (p + 4 <= plain.length && plain(p) == '\r' &&
                plain(p + 1) == '\n' && plain(p + 2) == '\r' &&
                plain(p + 3) == '\n') p += 4
              else ok = p == plain.length
              recs += WarcRecord(
                hdrs.getOrElse("warc-target-uri", ""),
                hdrs.getOrElse("warc-type", ""),
                cl, status, bodyLen,
                md5hex(plain, bodyOff, bodyLen), bodyOff,
                recOff, p - recOff)
          }
        }
      }
    }
    (recs.result(), plain)
  }

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }
}
