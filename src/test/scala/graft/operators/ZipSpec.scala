package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ZIP round-trip and malformed-input pins: central-directory walk,
  * stored + deflated entries, CRC verification, EOCD location, and
  * cross-validation against the JDK's own zip reader. */
class ZipSpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val files = Seq(
    ("a.txt", "hello zip", false),
    ("b.meta", """{"id":1}""", true),
    ("empty.txt", "", false),
    ("big.defl", "pattern " * 400, true))

  private def arch = Zip.buildArchive(files.map { case (n, d, z) =>
    (n, d.getBytes("UTF-8"), z) })

  test("entries round-trip: names, methods, sizes, inflated md5s") {
    val out = Zip.parse(arch)
    assert(out.map(_.name) == files.map(_._1))
    assert(out.map(_.method) == files.map(f => if (f._3) 8 else 0))
    assert(out.map(_.size) == files.map(_._2.length.toLong))
    assert(out.map(_.md5) == files.map(f => md5hex(f._2)))
  }

  test("the JDK's ZipInputStream reads our archives byte-identically") {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(arch))
    val seen = Iterator.continually(zin.getNextEntry)
      .takeWhile(_ != null)
      .map { e =>
        val content = zin.readAllBytes()
        (e.getName, new String(content, "UTF-8"))
      }.toSeq
    assert(seen == files.map(f => (f._1, f._2)))
  }

  test("our decoder reads JDK-ZipOutputStream-written archives") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    for ((n, d, defl) <- files) {
      val e = new java.util.zip.ZipEntry(n)
      if (!defl) {
        // STORED entries need sizes/crc up front
        val bytes = d.getBytes("UTF-8")
        val crc = new java.util.zip.CRC32(); crc.update(bytes)
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(bytes.length.toLong)
        e.setCompressedSize(bytes.length.toLong)
        e.setCrc(crc.getValue)
      }
      zos.putNextEntry(e)
      zos.write(d.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    val out = Zip.parse(bos.toByteArray)
    assert(out.map(_.name) == files.map(_._1))
    assert(out.map(_.size) == files.map(_._2.length.toLong))
    assert(out.map(_.md5) == files.map(f => md5hex(f._2)))
  }

  test("CRC corruption ends the walk; garbage and no-EOCD yield empty") {
    val a = arch
    // clobber a byte of a.txt's stored payload (after its 30+5 header)
    val bad = a.clone()
    bad(30 + 5) = 'X'
    assert(Zip.parse(bad).isEmpty) // first entry fails CRC → stop
    assert(Zip.parse(Array.fill[Byte](64)(7)).isEmpty)
    assert(Zip.parse(Array.emptyByteArray).isEmpty)
    assert(Zip.parse(a.dropRight(1)).isEmpty) // EOCD truncated
  }

  test("appended junk before EOCD scan still resolves the directory") {
    // the EOCD back-scan must find the record even with a trailing
    // comment-sized tail of noise bytes that contains no signature
    val a = arch ++ Array.fill[Byte](40)(0x55)
    // (comment length field says 0, so a strict reader errors; ours
    // scans back to the true EOCD — the common lenient behavior)
    assert(Zip.parse(a).map(_.name) == files.map(_._1))
  }
}
