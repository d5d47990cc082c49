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

  test("forced-ZIP64 archives round-trip through the 64-bit structures") {
    // forceZip64 saturates every classic field (0xFFFF count,
    // 0xFFFFFFFF sizes/offsets) so the parse MUST resolve through the
    // ZIP64 EOCD locator/record and the 0x0001 per-entry extras —
    // a wrong 64-bit offset read shows up as an empty or short walk
    val a = Zip.buildArchive(
      files.map { case (n, d, z) => (n, d.getBytes("UTF-8"), z) },
      forceZip64 = true)
    val out = Zip.parse(a)
    assert(out.map(_.name) == files.map(_._1))
    assert(out.map(_.method) == files.map(f => if (f._3) 8 else 0))
    assert(out.map(_.size) == files.map(_._2.length.toLong))
    assert(out.map(_.md5) == files.map(f => md5hex(f._2)))
  }

  test("the JDK reads our forced-ZIP64 archives byte-identically") {
    val a = Zip.buildArchive(
      files.map { case (n, d, z) => (n, d.getBytes("UTF-8"), z) },
      forceZip64 = true)
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(a))
    val seen = Iterator.continually(zin.getNextEntry)
      .takeWhile(_ != null)
      .map(e => (e.getName, new String(zin.readAllBytes(), "UTF-8")))
      .toSeq
    assert(seen == files.map(f => (f._1, f._2)))
  }

  test("a >65535-entry archive auto-switches to ZIP64 and round-trips") {
    // 65 540 entries overflow the classic 16-bit count — the builder
    // must emit the ZIP64 EOCD on its own (no force flag) and the
    // parser must read the 64-bit entry count, or the walk truncates
    // at 65 535
    val n = 65540
    val entries = (0 until n).map(i => (s"e$i", Array(i.toByte), false))
    val a = Zip.buildArchive(entries)
    val out = Zip.parse(a)
    assert(out.size == n)
    assert(out.head.name == "e0" && out.last.name == s"e${n - 1}")
    assert(out.forall(_.size == 1L))
  }

  test("truncated/garbled ZIP64 structures yield empty, never throw") {
    val a = Zip.buildArchive(
      files.map { case (n, d, z) => (n, d.getBytes("UTF-8"), z) },
      forceZip64 = true)
    // clobber the ZIP64 EOCD record signature: locator points at junk
    val recOff = {
      // locator sits 20 bytes before the classic EOCD (last 22 bytes)
      val loc = a.length - 22 - 20
      ((a(loc + 8) & 0xffL) | ((a(loc + 9) & 0xffL) << 8) |
        ((a(loc + 10) & 0xffL) << 16) | ((a(loc + 11) & 0xffL) << 24)).toInt
    }
    val bad = a.clone(); bad(recOff) = 0x00
    assert(Zip.parse(bad).isEmpty)
    // clobber the locator signature itself
    val bad2 = a.clone(); bad2(a.length - 42) = 0x00
    assert(Zip.parse(bad2).isEmpty)
  }
}
