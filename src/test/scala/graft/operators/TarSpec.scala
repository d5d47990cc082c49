package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ustar round-trip and malformed-input pins: header framing, octal
  * sizes, checksum verification, block padding, terminator and
  * truncation rules. */
class TarSpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("entries round-trip: names, sizes, md5s, walk order") {
    val files = Seq("a.txt" -> "hello", "a.cls" -> "label7",
      "b.txt" -> "", "c.bin" -> "x" * 1300)
    val arch = Tar.buildArchive(files.map { case (n, d) =>
      Tar.buildEntry(n, d.getBytes("UTF-8")) })
    // blocks: header+1 data, header+1, header+0 (empty), header+3;
    // plus the 2-block terminator
    assert(arch.length == (2 + 2 + 1 + 4 + 2) * Tar.Block)
    val out = Tar.parse(arch)
    assert(out.map(_.name) == files.map(_._1))
    assert(out.map(_.size) == files.map(_._2.length.toLong))
    assert(out.map(_.md5) == files.map(f => md5hex(f._2)))
  }

  test(".tgz transparency: gzip wrap parses identically, bombs stop") {
    val files = Seq("a.txt" -> "hello", "b.bin" -> "y" * 700)
    val arch = Tar.buildArchive(files.map { case (n, d) =>
      Tar.buildEntry(n, d.getBytes("UTF-8")) })
    val viaGz = Tar.parseAuto(Tar.gzipArchive(arch))
    assert(viaGz == Tar.parse(arch))
    // plain archives pass through parseAuto untouched
    assert(Tar.parseAuto(arch) == Tar.parse(arch))
    // corrupt gzip rejects cleanly
    val broken = Tar.gzipArchive(arch)
    broken(broken.length / 2) = (broken(broken.length / 2) ^ 0x55).toByte
    Tar.parseAuto(broken) // must not throw
    // an all-zero inflated payload is the tar terminator: no entries,
    // no throw (and the 2^28 inflation cap bounds crafted bombs)
    assert(Tar.parseAuto(Tar.gzipArchive(new Array[Byte](1 << 20))).isEmpty)
  }

  test("data offsets index the payload in place") {
    val arch = Tar.buildArchive(Seq(
      Tar.buildEntry("x.txt", "payload".getBytes("UTF-8"))))
    val e = Tar.parse(arch).head
    assert(new String(arch, e.dataOff, e.size.toInt, "UTF-8") == "payload")
  }

  test("corrupted checksum ends the walk without inventing entries") {
    val good = Tar.buildEntry("a.txt", "aa".getBytes("UTF-8"))
    val bad = Tar.buildEntry("b.txt", "bb".getBytes("UTF-8"))
    bad(150) = '9' // clobber a checksum digit
    assert(Tar.parse(Tar.buildArchive(Seq(good, bad))).map(_.name) ==
      Seq("a.txt"))
    // corrupting the NAME invalidates the stored checksum too
    val bad2 = Tar.buildEntry("c.txt", "cc".getBytes("UTF-8"))
    bad2(0) = 'z'
    assert(Tar.parse(Tar.buildArchive(Seq(bad2))).isEmpty)
  }

  test("truncation and garbage end the walk; terminator stops it") {
    val e = Tar.buildEntry("a.txt", ("y" * 600).getBytes("UTF-8"))
    assert(Tar.parse(e.take(700)).isEmpty) // data truncated mid-entry
    assert(Tar.parse(Array.fill[Byte](1024)(42)).isEmpty) // no magic
    assert(Tar.parse(new Array[Byte](2 * Tar.Block)).isEmpty)
    // entries AFTER the terminator are unreachable (the tar rule)
    val arch = Tar.buildArchive(Seq(e)) ++
      Tar.buildEntry("late.txt", "z".getBytes("UTF-8"))
    assert(Tar.parse(arch).map(_.name) == Seq("a.txt"))
  }
}
