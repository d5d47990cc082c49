package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** 7z pins: differentials against the commons-compress SevenZ
  * implementation Spark bundles (its writer runs LZMA2 through the
  * same bundled tukaani our decoder replaces) — LZMA2 and Copy
  * content methods, multi-file archives, empty files, encoded
  * (LZMA-compressed) headers, name fidelity — plus header-CRC
  * enforcement and mutation/garbage fuzz. */
class SevenZSpec extends AnyFunSuite {

  import org.apache.commons.compress.archivers.sevenz._

  private def build(files: Seq[(String, Array[Byte])],
      method: SevenZMethod): Array[Byte] = {
    val tmp = java.nio.file.Files.createTempFile("sz", ".7z")
    try {
      val w = new SevenZOutputFile(tmp.toFile)
      w.setContentCompression(method)
      files.foreach { case (name, content) =>
        val e = new SevenZArchiveEntry()
        e.setName(name)
        e.setSize(content.length.toLong)
        w.putArchiveEntry(e)
        w.write(content)
        w.closeArchiveEntry()
      }
      w.finish(); w.close()
      java.nio.file.Files.readAllBytes(tmp)
    } finally java.nio.file.Files.deleteIfExists(tmp): Unit
  }

  private def fixtures: Seq[(String, Array[Byte])] = Seq(
    ("a.txt", ("the quick brown fox " * 50).getBytes),
    ("dir/b.json", """{"k":"v","n":42}""".getBytes),
    ("empty.txt", Array.emptyByteArray),
    ("c.bin", {
      val rnd = new scala.util.Random(11)
      Array.fill[Byte](5000)(rnd.nextInt(8).toByte)
    }))

  test("differential: commons-compress LZMA2 archive -> our reader") {
    val arch = build(fixtures, SevenZMethod.LZMA2)
    assert(SevenZ.isSevenZ(arch))
    val got = SevenZ.parseWithData(arch)
    assert(got.isDefined, "LZMA2 archive rejected")
    val byName = got.get.map(e => e._1.name -> e._2).toMap
    assert(got.get.map(_._1.name) == fixtures.map(_._1))
    fixtures.foreach { case (name, content) =>
      assert(byName(name).sameElements(content), s"content of $name")
    }
  }

  test("differential: commons-compress COPY archive -> our reader") {
    val arch = build(fixtures.filter(_._2.nonEmpty), SevenZMethod.COPY)
    val got = SevenZ.parseWithData(arch)
    assert(got.isDefined, "COPY archive rejected")
    fixtures.filter(_._2.nonEmpty).foreach { case (name, content) =>
      assert(got.get.find(_._1.name == name).get._2
        .sameElements(content))
    }
  }

  test("differential: plain LZMA content method") {
    val arch = build(fixtures.filter(_._2.nonEmpty), SevenZMethod.LZMA)
    val got = SevenZ.parseWithData(arch)
    assert(got.isDefined, "LZMA archive rejected")
    fixtures.filter(_._2.nonEmpty).foreach { case (name, content) =>
      assert(got.get.find(_._1.name == name).get._2
        .sameElements(content))
    }
  }

  test("our entries agree with their reader on the same archive") {
    val arch = build(fixtures, SevenZMethod.LZMA2)
    val theirs = {
      val f = java.nio.file.Files.createTempFile("szr", ".7z")
      java.nio.file.Files.write(f, arch)
      try {
        val z = new SevenZFile(f.toFile)
        val out = Seq.newBuilder[(String, Long)]
        var e = z.getNextEntry
        while (e != null) {
          out += ((e.getName, e.getSize))
          e = z.getNextEntry
        }
        z.close()
        out.result()
      } finally java.nio.file.Files.deleteIfExists(f): Unit
    }
    val ours = SevenZ.parse(arch).map(e => (e.name, e.size))
    assert(ours == theirs)
  }

  test("ENCODED headers decode (the form the 7z CLI writes by default)") {
    // commons-compress writes plain headers, so craft the 0x17 form:
    // LZMA2-compress the original header with tukaani, append it as a
    // new pack stream, and point a hand-built EncodedHeader at it.
    val arch = build(fixtures, SevenZMethod.LZMA2)
    def le64(v: Long): Array[Byte] =
      (0 until 8).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    def le32of(v: Long): Array[Byte] =
      (0 until 4).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    val nhOff = {
      var v = 0L
      for (i <- 0 until 8) v |= (arch(12 + i) & 0xffL) << (8 * i)
      v
    }
    val nhSize = {
      var v = 0L
      for (i <- 0 until 8) v |= (arch(20 + i) & 0xffL) << (8 * i)
      v
    }
    val header = java.util.Arrays.copyOfRange(arch,
      (32 + nhOff).toInt, (32 + nhOff + nhSize).toInt)
    // raw LZMA2 sequence of the header bytes
    val packed = {
      val bos = new java.io.ByteArrayOutputStream()
      val opt = new org.tukaani.xz.LZMA2Options(6)
      opt.setDictSize(1 << 16)
      val f = opt.getOutputStream(
        new org.tukaani.xz.FinishableWrapperOutputStream(bos),
        org.tukaani.xz.ArrayCache.getDefaultCache)
      f.write(header); f.finish()
      bos.toByteArray
    }
    // EncodedHeader: 0x17 + StreamsInfo (pack stream at nhOff)
    val eh = new java.io.ByteArrayOutputStream()
    def num(v: Long): Unit = { eh.write(0xff); eh.write(le64(v)) }
    eh.write(0x17)
    eh.write(0x06); num(nhOff); num(1) // PackInfo: pos, 1 stream
    eh.write(0x09); num(packed.length.toLong); eh.write(0x00)
    eh.write(0x07); eh.write(0x0b); num(1); eh.write(0x00) // 1 folder
    num(1) // one coder
    eh.write(0x01 | 0x20) // id size 1, has props
    eh.write(0x21) // LZMA2
    num(1); eh.write(16) // props: dict code 16
    eh.write(0x0c); num(header.length.toLong); eh.write(0x00)
    eh.write(0x00)
    val ehArr = eh.toByteArray
    // new file: [0,32+nhOff) body ++ packed ++ EncodedHeader,
    // start header re-pointed and re-CRC'd
    val out = new java.io.ByteArrayOutputStream()
    out.write(arch, 0, (32 + nhOff).toInt)
    out.write(packed)
    out.write(ehArr)
    val full = out.toByteArray
    val newNhOff = nhOff + packed.length
    System.arraycopy(le64(newNhOff), 0, full, 12, 8)
    System.arraycopy(le64(ehArr.length.toLong), 0, full, 20, 8)
    val ehCrc = {
      val c = new java.util.zip.CRC32(); c.update(ehArr); c.getValue
    }
    System.arraycopy(le32of(ehCrc), 0, full, 28, 4)
    val shCrc = {
      val c = new java.util.zip.CRC32(); c.update(full, 12, 20)
      c.getValue
    }
    System.arraycopy(le32of(shCrc), 0, full, 8, 4)
    // our reader must decode the encoded header, then the archive
    val got = SevenZ.parseWithData(full)
    assert(got.isDefined, "encoded header rejected")
    assert(got.get.map(_._1.name) == fixtures.map(_._1))
    fixtures.foreach { case (name, content) =>
      assert(got.get.find(_._1.name == name).get._2
        .sameElements(content))
    }
    // and commons-compress agrees the crafted file is valid
    val tmp = java.nio.file.Files.createTempFile("szeh", ".7z")
    java.nio.file.Files.write(tmp, full)
    try {
      val z = new SevenZFile(tmp.toFile)
      var n = 0
      var e = z.getNextEntry
      while (e != null) { n += 1; e = z.getNextEntry }
      z.close()
      assert(n == fixtures.length)
    } finally java.nio.file.Files.deleteIfExists(tmp): Unit
  }

  test("OUR writer -> commons-compress SevenZFile AND our reader, " +
    "both codecs (late r14)") {
    val files = Seq(
      ("a.txt", ("the quick brown fox " * 50).getBytes),
      ("dir/β-unicode.json", """{"k":"v","n":42}""".getBytes),
      ("c.bin", {
        val rnd = new scala.util.Random(13)
        Array.fill[Byte](70000)(rnd.nextInt(8).toByte)
      }))
    for (codec <- Seq("copy", "lzma2")) {
      val arch = SevenZ.build(files, codec)
      assert(SevenZ.isSevenZ(arch))
      // our own reader first (CRCs verified inside)
      locally {
        val ours = SevenZ.parseWithData(arch)
        assert(ours.isDefined, s"$codec: our reader rejected our archive")
        assert(ours.get.map(_._1.name) == files.map(_._1))
      }
      // commons-compress — the independent reader
      val tmp = java.nio.file.Files.createTempFile("szw", ".7z")
      java.nio.file.Files.write(tmp, arch)
      val z = new SevenZFile(tmp.toFile)
      files.foreach { case (name, content) =>
        val e = z.getNextEntry
        assert(e != null && e.getName == name, s"$codec: $name")
        assert(e.getSize == content.length.toLong)
        val buf = new Array[Byte](content.length)
        var got = 0
        while (got < buf.length) {
          val n = z.read(buf, got, buf.length - got)
          assert(n > 0); got += n
        }
        assert(buf.sameElements(content), s"$codec content of $name")
      }
      assert(z.getNextEntry == null)
      z.close()
      java.nio.file.Files.deleteIfExists(tmp)
      // and our own reader agrees (CRCs verified inside)
      val ours = SevenZ.parseWithData(arch)
      assert(ours.isDefined, s"$codec: our reader rejected our archive")
      assert(ours.get.map(_._1.name) == files.map(_._1))
      ours.get.zip(files).foreach { case ((_, c), (n, want)) =>
        assert(c.sameElements(want), s"$codec ours: $n")
      }
      // lzma2 must actually compress the repetitive member
      if (codec == "lzma2")
        assert(arch.length < files.map(_._2.length).sum)
    }
    // loud rejections: empty entries and unknown codecs
    intercept[IllegalArgumentException](
      SevenZ.build(Seq(("x", Array.emptyByteArray))))
    intercept[IllegalArgumentException](
      SevenZ.build(Seq(("x", Array[Byte](1))), "bzip2"))
  }

  test("header CRC corruption rejects") {
    val arch = build(fixtures, SevenZMethod.LZMA2)
    // start-header CRC byte
    val bad1 = arch.clone(); bad1(8) = (bad1(8) ^ 1).toByte
    assert(SevenZ.parseWithData(bad1).isEmpty)
    // next-header bytes (the tail of the file)
    val bad2 = arch.clone()
    bad2(bad2.length - 3) = (bad2(bad2.length - 3) ^ 1).toByte
    assert(SevenZ.parseWithData(bad2).isEmpty)
  }

  test("mutation and garbage fuzz never throw, never invent") {
    val arch = build(fixtures, SevenZMethod.LZMA2)
    val want = fixtures.map(f => f._1 ->
      java.security.MessageDigest.getInstance("MD5").digest(f._2)
        .map("%02x".format(_)).mkString).toMap
    val rnd = new scala.util.Random(0x7247)
    for (_ <- 0 until 1200) {
      val bad = arch.clone()
      bad(rnd.nextInt(bad.length)) = rnd.nextInt().toByte
      SevenZ.parseWithData(bad).foreach { entries =>
        // a surviving mutation must not corrupt any CRC-covered file
        entries.foreach { case (e, c) =>
          want.get(e.name).foreach { md5 =>
            assert(e.md5 == md5,
              s"mutation survived CRC and corrupted ${e.name}")
          }
        }
      }
    }
    // OUR writer's archives under the same mutation rule (late r14)
    val nonEmpty = fixtures.filter(_._2.nonEmpty)
    val ours = SevenZ.build(nonEmpty, "lzma2")
    for (_ <- 0 until 1200) {
      val bad = ours.clone()
      bad(rnd.nextInt(bad.length)) = rnd.nextInt().toByte
      SevenZ.parseWithData(bad).foreach { entries =>
        entries.foreach { case (e, _) =>
          want.get(e.name).foreach { md5 =>
            assert(e.md5 == md5,
              s"mutation of OUR archive survived CRC: ${e.name}")
          }
        }
      }
    }
    for (_ <- 0 until 2000) {
      val junk = Array.fill(rnd.nextInt(96))(rnd.nextInt().toByte)
      SevenZ.parseWithData(junk)
      SevenZ.parseWithData("7z".getBytes ++
        Array[Byte](0xbc.toByte, 0xaf.toByte, 0x27, 0x1c) ++ junk)
    }
  }
}
