package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip and malformed-input pins for the WARC container walk
  * (operators/Warc): exact framing, multi-record order, gzip-member
  * transparency, and the strict-but-skipping error behavior. */
class WarcSpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("single record round-trips with exact framing facts") {
    val body = "hello warc"
    val rec = Warc.buildRecord(7L, "http://ex0.com/doc/7",
      body.getBytes("UTF-8"))
    val out = Warc.parseArchive(rec)
    assert(out.size == 1)
    val r = out.head
    assert(r.uri == "http://ex0.com/doc/7")
    assert(r.warcType == "response")
    assert(r.httpStatus == 200)
    assert(r.bodyLen == body.length)
    assert(r.bodyMd5 == md5hex(body))
    // envelope arithmetic the oracle depends on: 63 fixed bytes +
    // body-length digits + body
    assert(r.contentLength ==
      63 + body.length.toString.length + body.length)
  }

  test("multi-record archive walks in order; gzip members transparent") {
    val bodies = Seq("a", "bb ccc", "", "x" * 300)
    val recs = bodies.zipWithIndex.map { case (b, i) =>
      Warc.buildRecord(i.toLong, s"http://ex.com/doc/$i",
        b.getBytes("UTF-8"))
    }
    for (gz <- Seq(false, true)) {
      val out = Warc.parseArchive(Warc.buildArchive(recs, gz))
      assert(out.size == 4, s"gzip=$gz")
      assert(out.map(_.uri) == bodies.indices.map(i => s"http://ex.com/doc/$i"))
      assert(out.map(_.bodyLen) == bodies.map(_.length.toLong))
      assert(out.map(_.bodyMd5) == bodies.map(md5hex))
    }
  }

  test("non-ASCII body: lengths are BYTES, not chars") {
    val body = "café ≠ cafe"
    val rec = Warc.buildRecord(1L, "http://ex.com/doc/1",
      body.getBytes("UTF-8"))
    val r = Warc.parseArchive(rec).head
    assert(r.bodyLen == body.getBytes("UTF-8").length)
    assert(r.bodyLen > body.length) // multi-byte chars present
    assert(r.bodyMd5 == md5hex(body))
  }

  test("malformed inputs end the walk without inventing records") {
    val good = Warc.buildRecord(0L, "http://ex.com/doc/0",
      "ok".getBytes("UTF-8"))
    // torn tail: a second record truncated mid-payload
    val torn = good ++ good.dropRight(10)
    assert(Warc.parseArchive(torn).size == 1)
    // bad version line ends the walk immediately
    val badVersion = "HTTP/1.0\r\n\r\n".getBytes("UTF-8") ++ good
    assert(Warc.parseArchive(badVersion).isEmpty)
    // missing Content-Length ends the walk
    val noCl = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n")
      .getBytes("UTF-8") ++ good
    assert(Warc.parseArchive(noCl).isEmpty)
    // garbage after a valid record separator stops cleanly
    val trailing = good ++ "junk".getBytes("UTF-8")
    assert(Warc.parseArchive(trailing).size == 1)
    assert(Warc.parseArchive(Array.emptyByteArray).isEmpty)
  }

  test("non-HTTP payload reports status -1 with the full block as body") {
    val payload = "just bytes".getBytes("UTF-8")
    val rec = (s"WARC/1.0\r\nWARC-Type: resource\r\n" +
      s"WARC-Target-URI: http://ex.com/r\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++
      payload ++ "\r\n\r\n".getBytes("UTF-8")
    val r = Warc.parseArchive(rec).head
    assert(r.warcType == "resource")
    assert(r.httpStatus == -1)
    assert(r.bodyLen == payload.length)
  }
}
