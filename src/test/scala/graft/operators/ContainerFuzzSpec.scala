package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Seeded-fuzz pins for every container walk: arbitrary payloads
  * round-trip exactly, and arbitrary GARBAGE never makes a parser
  * throw or invent entries — the robustness contract a crawl-scale
  * ingest pipeline actually needs (real archives arrive truncated,
  * bit-flipped and mislabeled). Deterministic seed: failures
  * reproduce. */
class ContainerFuzzSpec extends AnyFunSuite {

  private val Cases = 200

  private def rng = new java.util.Random(0x9e3779b9L)

  private def bytes(r: java.util.Random, max: Int = 2000): Array[Byte] = {
    val b = new Array[Byte](r.nextInt(max + 1))
    r.nextBytes(b)
    b
  }

  private def name(r: java.util.Random): String =
    (1 to (1 + r.nextInt(40)))
      .map(_ => ('a' + r.nextInt(26)).toChar).mkString

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  test("tar: arbitrary binary payloads round-trip exactly") {
    val r = rng
    for (_ <- 1 to Cases) {
      val files = Seq.fill(1 + r.nextInt(3))((name(r), bytes(r)))
      val out = Tar.parse(Tar.buildArchive(files.map { case (n, d) =>
        Tar.buildEntry(n, d) }))
      assert(out.map(_.name) == files.map(_._1))
      assert(out.map(_.size) == files.map(_._2.length.toLong))
      assert(out.map(_.md5) == files.map(f => md5hex(f._2)))
    }
  }

  test("zip: arbitrary binary payloads round-trip, stored and deflated") {
    val r = rng
    for (_ <- 1 to Cases) {
      val files = Seq.fill(1 + r.nextInt(3))(
        (name(r), bytes(r), r.nextBoolean()))
      val out = Zip.parse(Zip.buildArchive(files))
      assert(out.map(_.name) == files.map(_._1))
      assert(out.map(_.size) == files.map(_._2.length.toLong))
      assert(out.map(_.md5) == files.map(f => md5hex(f._2)))
    }
  }

  test("warc: arbitrary binary bodies round-trip through gzip members") {
    val r = rng
    for (_ <- 1 to Cases) {
      val bodies = Seq.fill(1 + r.nextInt(2))(bytes(r))
      val gz = r.nextBoolean()
      val recs = bodies.zipWithIndex.map { case (b, i) =>
        Warc.buildRecord(i.toLong, s"http://x.com/$i", b) }
      val out = Warc.parseArchive(Warc.buildArchive(recs, gz))
      assert(out.map(_.bodyLen) == bodies.map(_.length.toLong))
      assert(out.map(_.bodyMd5) == bodies.map(md5hex))
    }
  }

  test("h264: escape/unescape round-trips arbitrary RBSP payloads") {
    val r = rng
    for (_ <- 1 to Cases) {
      val rbsp = bytes(r, 500)
      val esc = H264.escape(rbsp)
      assert(H264.unescape(esc).toSeq == rbsp.toSeq)
      // the escaped form may never contain a start code
      assert(!esc.toSeq.sliding(3).exists(_ == Seq[Byte](0, 0, 1)))
    }
  }

  test("tfrecord: arbitrary binary payloads round-trip exactly") {
    val r = rng
    for (_ <- 1 to Cases) {
      val bodies = Seq.fill(1 + r.nextInt(3))(bytes(r))
      val out = TfRecord.parse(
        TfRecord.buildShard(bodies.map(TfRecord.buildRecord)))
      assert(out.map(_.length) == bodies.map(_.length.toLong))
      assert(out.map(_.md5) == bodies.map(md5hex))
    }
  }

  test("garbage never throws and never invents entries") {
    val r = rng
    for (_ <- 1 to Cases) {
      val junk = bytes(r)
      Tar.parse(junk)          // must not throw
      Zip.parse(junk)
      Warc.parseArchive(junk)
      H264.parse(junk)
      H264.decodeIPcmPixels(junk)
      MpegAudio.decode(junk)
      MpegAudio.decodeL2(junk)
      TfRecord.parse(junk)
      Tar.parseAuto(junk) // incl. 0x1f8b-prefixed corrupt gzip
      Vp8l.decode(junk)
      Flac.decode(junk)
      Ogg.parsePackets(junk)
      Multimodal.decodeTiffPixels(junk)
      Multimodal.tiffLzwDecode(junk, 0, junk.length,
        math.min(junk.length * 4, 1 << 16))
      assert(Tar.parse(junk).forall(_.size >= 0))
    }
  }

  test("zip: crafted huge/negative central-directory sizes end the walk") {
    // r9 ADVICE: usize >= 2^31 used to wrap negative into the inflate
    // allocation; any claimed size far beyond DEFLATE's 1032:1 bound
    // is a decompression bomb. Both must end the walk, never throw.
    val base = Zip.buildArchive(Seq(("f.txt", "hello zip".getBytes, true)))
    // locate the central directory entry (PK\1\2) and patch usize
    var cd = -1
    for (i <- 0 until base.length - 3 if cd < 0)
      if (base(i) == 'P' && base(i + 1) == 'K' && base(i + 2) == 1 &&
        base(i + 3) == 2) cd = i
    assert(cd > 0)
    for (usize <- Seq(0x80000000L, 0xffffffffL, 0x40000000L)) {
      val m = base.clone()
      var k = 0
      while (k < 4) {
        m(cd + 24 + k) = ((usize >> (8 * k)) & 0xff).toByte
        k += 1
      }
      assert(Zip.parse(m).isEmpty) // ended, not thrown, nothing invented
    }
    // and a wrapped local-header offset must not index out of bounds
    val m2 = base.clone()
    for (k <- 0 until 4) m2(cd + 42 + k) = 0xfe.toByte
    assert(Zip.parse(m2).isEmpty)
  }

  test("single corrupted byte in a tar header is always detected") {
    val r = rng
    for (_ <- 1 to Cases) {
      val data = bytes(r, 600)
      val e = Tar.buildEntry("f.bin", data)
      val pos = r.nextInt(148)
      if (e(pos) != 1) {
        e(pos) = 1 // a byte no valid header field contains here
        val parsed = Tar.parse(Tar.buildArchive(Seq(e)))
        // the checksum catches the flip (or the walk just ends)
        assert(parsed.isEmpty || parsed.head.md5 == md5hex(data))
      }
    }
  }
}
