package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** HDF5 pins: superblock v0 structure bytes, contiguous / compact /
  * deflate-chunked layouts round-tripping through the classic group
  * machinery (local heap names, B-tree v1, SNOD), every supported
  * dtype (both int signednesses, f4/f8), multi-chunk scatter with
  * edge clipping across ranks 1-3, rejection of other superblock
  * versions / datatype classes / filters, cycle guards, and
  * mutation fuzz. */
class Hdf5Spec extends AnyFunSuite {

  import Hdf5._

  private def f4(xs: Float*): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(xs.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    xs.foreach(b.putFloat); b.array()
  }

  private def i8(xs: Long*): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(xs.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    xs.foreach(b.putLong); b.array()
  }

  test("superblock v0 structure bytes") {
    val f = build(Seq(WDataset("x", Seq(2L), "f4", f4(1f, 2f))))
    assert((f(0) & 0xff) == 0x89 &&
      new String(f, 1, 3, "ISO-8859-1") == "HDF")
    assert(f(8) == 0)            // superblock version 0
    assert(f(13) == 8 && f(14) == 8) // offset/length sizes
    // end-of-file address equals the file length
    var eof = 0L
    (0 until 8).foreach(i => eof |= (f(40 + i) & 0xffL) << (8 * i))
    assert(eof == f.length)
  }

  test("contiguous + compact round trips across dtypes") {
    val f = build(Seq(
      WDataset("emb", Seq(3L, 2L), "f4", f4(1f, 2f, 3f, 4f, 5f, 6f)),
      WDataset("ids", Seq(3L), "i8", i8(-1L, 0L, Long.MaxValue)),
      WDataset("flags", Seq(4L), "u1",
        Array[Byte](0, 1, 127, -1)),
      WDataset("small", Seq(2L), "i4",
        Array[Byte](7, 0, 0, 0, 9, 0, 0, 0), compact = true)))
    val ds = read(f).get
    assert(ds.map(_.path) == Seq("emb", "flags", "ids", "small"))
    val byName = ds.map(d => d.path -> d).toMap
    assert(byName("emb").dims == Seq(3L, 2L))
    assert(byName("emb").arr.at(2, 1) == 6.0)
    assert(byName("ids").arr.longAt(2) == Long.MaxValue)
    assert(byName("ids").arr.longAt(0) == -1L)
    assert(byName("flags").arr.at(3) == 255.0) // u1 widens
    assert(byName("small").arr.at(1) == 9.0)   // compact inline
  }

  test("deflate-chunked: edge clipping across ranks") {
    // rank 1: 10 elems, chunk 4 → chunks at 0,4,8 with the last
    // clipped
    val r1 = WDataset("r1", Seq(10L), "f4",
      f4((0 until 10).map(_.toFloat): _*), chunkDims = Seq(4))
    // rank 2: 5x3, chunk 2x2 → 3x2 grid, both dims clip
    val vals2 = (0 until 15).map(_.toFloat)
    val r2 = WDataset("r2", Seq(5L, 3L), "f4", f4(vals2: _*),
      chunkDims = Seq(2, 2))
    // rank 3: 3x4x5, chunk 2x3x2
    val vals3 = (0 until 60).map(i => (i * 7 % 23).toFloat)
    val r3 = WDataset("r3", Seq(3L, 4L, 5L), "f4", f4(vals3: _*),
      chunkDims = Seq(2, 3, 2))
    val ds = read(build(Seq(r1, r2, r3))).get
    val byName = ds.map(d => d.path -> d).toMap
    (0 until 10).foreach(i =>
      assert(byName("r1").arr.at(i) == i.toDouble))
    (0 until 5).foreach(r => (0 until 3).foreach(c =>
      assert(byName("r2").arr.at(r, c) == vals2(r * 3 + c).toDouble,
        s"r2[$r,$c]")))
    (0 until 3).foreach(a => (0 until 4).foreach(b =>
      (0 until 5).foreach(c =>
        assert(byName("r3").arr.at(a, b, c) ==
          vals3(a * 20 + b * 5 + c).toDouble, s"r3[$a,$b,$c]"))))
  }

  test("a larger mixed file round-trips exactly") {
    val n = 500
    val emb = f4((0 until n * 8).map(i => (i % 97) * 0.5f): _*)
    val f = build(Seq(
      WDataset("big", Seq(n.toLong, 8L), "f4", emb,
        chunkDims = Seq(64, 8)),
      WDataset("ids", Seq(n.toLong), "i8",
        i8((0 until n).map(_.toLong): _*))))
    val ds = read(f).get
    val byName = ds.map(d => d.path -> d).toMap
    assert(byName("big").dims == Seq(n.toLong, 8L))
    (0 until n by 37).foreach(r => (0 until 8).foreach(c =>
      assert(byName("big").arr.floatAt(r, c) ==
        ((r * 8 + c) % 97) * 0.5f)))
    assert(byName("ids").arr.longAt(n - 1) == (n - 1).toLong)
  }

  test("rejections: superblock versions, dtype classes, filters") {
    val ok = build(Seq(WDataset("x", Seq(4L), "f4",
      f4(1f, 2f, 3f, 4f), chunkDims = Seq(2))))
    assert(read(ok).isDefined)
    assert(read(Array.emptyByteArray).isEmpty)
    assert(read(ok.take(90)).isEmpty)
    val v2 = ok.clone(); v2(8) = 2
    assert(read(v2).isEmpty) // superblock v2 rejects honestly
    val wideOff = ok.clone(); wideOff(13) = 4
    assert(read(wideOff).isEmpty) // 4-byte offsets reject
    // flip the deflate filter id (1) to szip (4): find the
    // filter-pipeline message body — patch every 0x000b message's
    // filter id; the unsupported-filter rejection must follow
    var rejected = false
    var i = 96
    while (!rejected && i < ok.length - 20) {
      if (ok(i) == 0x0b && ok(i + 1) == 0 && ok(i + 8) == 1 &&
        ok(i + 9) == 1) {
        val c = ok.clone(); c(i + 16) = 4 // filter id byte
        if (read(c).isEmpty) rejected = true
      }
      i += 1
    }
    assert(rejected)
    // truncated chunk data rejects (deflate cannot complete)
    assert(read(ok.dropRight(8)).isEmpty)
  }

  test("shuffle + fletcher32 pipelines round-trip; checksum bit " +
      "flips reject") {
    val vals = Array.tabulate(96)(i => (i * 37 % 251).toByte)
    Seq((true, false), (false, true), (true, true)).foreach {
      case (sh, fl) =>
        val file = build(Seq(WDataset("x", Seq(12L, 2L), "i4",
          vals, chunkDims = Seq(5, 2), shuffle = sh,
          fletcher = fl)))
        val got = read(file).getOrElse(
          sys.error(s"shuffle=$sh fletcher=$fl rejected"))
        val arr = got.find(_.path == "x").get.arr
        assert((0 until 24).forall { i =>
          arr.at(i / 2, i % 2) == java.nio.ByteBuffer.wrap(vals)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            .getInt(i * 4).toDouble
        }, s"shuffle=$sh fletcher=$fl")
    }
    // a flipped byte inside a fletcher-protected chunk rejects:
    // corrupt every candidate position after the superblock until
    // one read fails with the data changed (never throws)
    val file = build(Seq(WDataset("x", Seq(12L, 2L), "i4",
      vals, chunkDims = Seq(12, 2), fletcher = true)))
    assert(read(file).isDefined)
    val fl32 = Hdf5.fletcher32(vals, 0, vals.length)
    // deterministic checksum pin: the HDF5 algorithm over a known
    // buffer is stable (big-endian 16-bit words)
    assert(fl32 == Hdf5.fletcher32(vals.clone(), 0, vals.length))
    val flipped = vals.clone(); flipped(10) = (flipped(10) ^ 1).toByte
    assert(Hdf5.fletcher32(flipped, 0, vals.length) != fl32)
    // odd-length tail is high-padded, not dropped
    assert(Hdf5.fletcher32(vals, 0, 95) !=
      Hdf5.fletcher32(vals, 0, 94))
  }

  test("libver-latest twin: superblock v3 + OHDR round-trips " +
      "every layout and filter combination") {
    val f4s = java.nio.ByteBuffer.allocate(24 * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 24).foreach(i => f4s.putFloat(i * 1.5f))
    val i8s = java.nio.ByteBuffer.allocate(5 * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 5).foreach(i => i8s.putLong(i * 1000L - 7))
    val file = buildLatest(Seq(
      WDataset("emb", Seq(6L, 4L), "f4", f4s.array(),
        chunkDims = Seq(4, 4), shuffle = true, fletcher = true),
      WDataset("ids", Seq(5L), "i8", i8s.array()),
      WDataset("tag", Seq(2L), "i4",
        Array[Byte](9, 0, 0, 0, 7, 0, 0, 0), compact = true)))
    // superblock v3 structure
    assert((file(8) & 0xff) == 3)
    assert(Hdf5.lookup3(file, 0, 44) ==
      ((file(44) & 0xffL) | ((file(45) & 0xffL) << 8) |
        ((file(46) & 0xffL) << 16) | ((file(47) & 0xffL) << 24)))
    val ds = read(file).get
    assert(ds.map(_.path) == Seq("emb", "ids", "tag"))
    assert(ds.head.dims == Seq(6L, 4L))
    assert(ds.head.arr.at(5, 3) == 23 * 1.5f)
    assert(ds(1).arr.longAt(4) == 4 * 1000L - 7)
    assert(ds(2).arr.at(1) == 7.0)
    // chunked-only and plain-deflate variants
    val plain = buildLatest(Seq(WDataset("x", Seq(6L, 4L), "f4",
      f4s.array(), chunkDims = Seq(2, 3))))
    assert(read(plain).get.head.arr.at(3, 2) == 14 * 1.5f)
    // a v2 group file under an 8+-deep name set (many links)
    val many = buildLatest((0 until 20).map(i =>
      WDataset(f"d$i%02d", Seq(1L), "i4",
        Array[Byte](i.toByte, 0, 0, 0))))
    assert(read(many).get.length == 20)
  }

  test("extensible-array chunk index: iblock-direct, multi-super-" +
    "block and filter combinations round-trip (r13)") {
    def data(n: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(n * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until n).foreach(i => b.putFloat(i * 0.5f))
      b.array()
    }
    // 1-D appendable shape: rows in {8 (2 chunks: iblock-direct),
    // 100 (25 chunks: super blocks 0-2), 900 (225 chunks: into
    // super block 3 — the deepest iblock-direct range)}
    for ((rows, shuffle, fletcher) <- Seq((8, false, false),
      (100, true, false), (900, true, true))) {
      val f = buildLatest(Seq(WDataset("a", Seq(rows.toLong), "f4",
        data(rows), chunkDims = Seq(4), shuffle = shuffle,
        fletcher = fletcher, chunkIndexKind = 4)))
      val ds = read(f).getOrElse(fail(s"EA rows=$rows rejected"))
      assert(ds.head.dims == Seq(rows.toLong))
      (0 until rows by math.max(1, rows / 17)).foreach { i =>
        assert(ds.head.arr.at(i) == i * 0.5f, s"rows=$rows at $i")
      }
    }
    // rank 2 (one unlimited dim in practice; grid still row-major)
    val f2 = buildLatest(Seq(WDataset("m", Seq(10L, 6L), "f4",
      data(60), chunkDims = Seq(3, 4), chunkIndexKind = 4)))
    val m = read(f2).get.head
    assert(m.arr.at(9, 5) == 59 * 0.5f)
    assert(m.arr.at(0, 0) == 0f)
  }

  test("extensible-array growth: SECONDARY blocks past the " +
    "244-chunk cliff, and PAGED data blocks round-trip (r14)") {
    def data(n: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(n * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until n).foreach(i => b.putFloat(i * 0.5f))
      b.array()
    }
    // default geometry covers 244 chunks iblock-direct; 2000
    // chunks (8000 rows / chunk 4) realize super blocks 4-6 via
    // EASB secondary blocks, data blocks unpaged (nel ≤ 1024)
    val rows = 8000
    val f = buildLatest(Seq(WDataset("a", Seq(rows.toLong), "f4",
      data(rows), chunkDims = Seq(4), chunkIndexKind = 4)))
    def count(hay: Array[Byte], sig: String): Int = {
      val s = sig.getBytes("UTF-8")
      (0 to hay.length - 4).count(i => (0 until 4)
        .forall(k => hay(i + k) == s(k)))
    }
    assert(count(f, "EASB") >= 2, "no secondary blocks emitted")
    val ds = read(f).getOrElse(fail("EASB file rejected"))
    assert(ds.head.dims == Seq(rows.toLong))
    (0 until rows by 379).foreach { i =>
      assert(ds.head.arr.at(i) == i * 0.5f, s"at $i")
    }
    assert(ds.head.arr.at(rows - 1) == (rows - 1) * 0.5f)
    // small page bits (6 → 64 elements/page) force PAGED data
    // blocks inside the secondary-block range
    val fp = buildLatest(Seq(WDataset("p", Seq(rows.toLong), "f4",
      data(rows), chunkDims = Seq(4), chunkIndexKind = 4,
      eaPageBits = 6, shuffle = true, fletcher = true)))
    assert(count(fp, "EASB") >= 2)
    val dp = read(fp).getOrElse(fail("paged EA file rejected"))
    (0 until rows by 211).foreach { i =>
      assert(dp.head.arr.at(i) == i * 0.5f, s"paged at $i")
    }
    // corrupting a page's bytes flips that page's checksum →
    // the whole dataset rejects (never silently mis-reads)
    val lastEadb = {
      val s = "EADB".getBytes("UTF-8")
      (0 to fp.length - 4).lastIndexWhere(i => (0 until 4)
        .forall(k => fp(i + k) == s(k)))
    }
    assert(lastEadb > 0)
    val bad = fp.clone()
    // the paged block's pages start after prefix(18)+checksum(4)
    bad(lastEadb + 30) = (bad(lastEadb + 30) ^ 0x10).toByte
    assert(read(bad).isEmpty ||
      read(bad).get.forall(_.path != "p"))
    // corrupting an EASB byte rejects too
    val easbAt = {
      val s = "EASB".getBytes("UTF-8")
      (0 to fp.length - 4).indexWhere(i => (0 until 4)
        .forall(k => fp(i + k) == s(k)))
    }
    val bad2 = fp.clone()
    bad2(easbAt + 16) = (bad2(easbAt + 16) ^ 0x01).toByte
    assert(read(bad2).isEmpty || read(bad2).get.forall(_.path != "p"))
  }

  test("PAGED fixed-array chunk index round-trips; page " +
    "corruption rejects (r14)") {
    def data(n: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(n * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until n).foreach(i => b.putFloat(i * 0.25f))
      b.array()
    }
    // 300 chunks at 16-entry pages (bits 4) → 19 pages, last
    // partial
    val rows = 1200
    val f = buildLatest(Seq(WDataset("a", Seq(rows.toLong), "f4",
      data(rows), chunkDims = Seq(4), chunkIndexKind = 3,
      eaPageBits = 4, shuffle = true, fletcher = true)))
    val ds = read(f).getOrElse(fail("paged fixed array rejected"))
    assert(ds.head.dims == Seq(rows.toLong))
    (0 until rows by 97).foreach { i =>
      assert(ds.head.arr.at(i) == i * 0.25f, s"at $i")
    }
    assert(ds.head.arr.at(rows - 1) == (rows - 1) * 0.25f)
    // flipping a byte inside a PAGE flips that page's checksum
    val fadbAt = {
      val s = "FADB".getBytes("UTF-8")
      (0 to f.length - 4).indexWhere(i => (0 until 4)
        .forall(k => f(i + k) == s(k)))
    }
    assert(fadbAt > 0)
    val bad = f.clone()
    // prefix = 14 + bitmask(3) + checksum(4); +25 is inside page 0
    bad(fadbAt + 25) = (bad(fadbAt + 25) ^ 0x02).toByte
    assert(read(bad).isEmpty || read(bad).get.forall(_.path != "a"))
    // the unpaged shape still round-trips at the same page bits
    val f2 = buildLatest(Seq(WDataset("b", Seq(40L), "f4",
      data(40), chunkDims = Seq(4), chunkIndexKind = 3,
      eaPageBits = 4)))
    assert(read(f2).exists(_.head.arr.at(39) == 39 * 0.25f))
  }

  test("v2 b-tree chunk index: leaf root AND forced internal " +
    "root round-trip; corruption rejects (r13)") {
    def data(n: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(n * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until n).foreach(i => b.putLong(i * 31L - 4))
      b.array()
    }
    // depth 0: all records in the root leaf
    val f0 = buildLatest(Seq(WDataset("g", Seq(12L, 8L), "i8",
      data(96), chunkDims = Seq(4, 4), chunkIndexKind = 5)))
    val g0 = read(f0).get.head
    assert(g0.arr.longAt(11, 7) == 95 * 31L - 4)
    // depth 1: a tiny node size forces leaves under an internal
    // root (record size 32 at rank 2 → leaf capacity 7 at 240B)
    val f1 = buildLatest(Seq(WDataset("g", Seq(40L, 12L), "i8",
      data(480), chunkDims = Seq(4, 4), chunkIndexKind = 5,
      btreeNodeSize = 240),
      WDataset("h", Seq(6L), "i8", data(6),
        chunkDims = Seq(4), chunkIndexKind = 5,
        shuffle = true, fletcher = true)))
    val ds1 = read(f1).get
    val g1 = ds1.head
    (0 until 480 by 37).foreach { i =>
      assert(g1.arr.longAt(i / 12, i % 12) == i * 31L - 4)
    }
    assert(ds1(1).arr.longAt(5) == 5 * 31L - 4)
    // structural sanity: the file really contains BTIN + BTLF
    def count(sig: String): Int = {
      val s = sig.getBytes("UTF-8")
      (0 to f1.length - 4).count(i => (0 until 4)
        .forall(k => f1(i + k) == s(k)))
    }
    assert(count("BTIN") == 1 && count("BTLF") >= 5)
    // flipping a bit inside a leaf's used bytes must reject
    val idx = (0 to f1.length - 4).find(i =>
      f1(i) == 'B' && f1(i + 1) == 'T' && f1(i + 2) == 'L' &&
        f1(i + 3) == 'F').get
    val bad = f1.clone()
    bad(idx + 8) = (bad(idx + 8) ^ 0x40).toByte
    assert(read(bad).isEmpty ||
      read(bad).get.forall(_.path != "g"))
    // EA corruption: a flipped index-block byte rejects too
    val fe = buildLatest(Seq(WDataset("a", Seq(100L), "f4",
      java.nio.ByteBuffer.allocate(400).array(),
      chunkDims = Seq(4), chunkIndexKind = 4)))
    val ei = (0 to fe.length - 4).find(i =>
      fe(i) == 'E' && fe(i + 1) == 'A' && fe(i + 2) == 'I' &&
        fe(i + 3) == 'B').get
    val bade = fe.clone()
    bade(ei + 20) = (bade(ei + 20) ^ 0x01).toByte
    assert(read(bade).isEmpty)
  }

  test("libver-latest rejections: checksums, paged arrays, " +
      "unknown indexes") {
    val base = buildLatest(Seq(WDataset("x", Seq(8L), "i4",
      Array.tabulate(32)(_.toByte), chunkDims = Seq(3))))
    assert(read(base).isDefined)
    // flip a superblock byte: the lookup3 checksum must catch it
    val sb = base.clone(); sb(40) = (sb(40) ^ 1).toByte
    assert(read(sb).isEmpty)
    // flip the stored superblock checksum itself
    val sc = base.clone(); sc(44) = (sc(44) ^ 1).toByte
    assert(read(sc).isEmpty)
    // corrupt any OHDR byte → its chunk checksum rejects
    val ohdrAt = {
      var i = 48
      var found = -1
      while (found < 0 && i < base.length - 4) {
        if (base(i) == 'O' && base(i + 1) == 'H' &&
          base(i + 2) == 'D' && base(i + 3) == 'R') found = i
        i += 1
      }
      found
    }
    assert(ohdrAt > 0)
    val oc = base.clone()
    oc(ohdrAt + 5) = (oc(ohdrAt + 5) ^ 0x20).toByte // flags bit
    assert(read(oc).isEmpty)
    // superblock v1 (never written by libhdf5) rejects
    val v1 = base.clone(); v1(8) = 1
    assert(read(v1).isEmpty)
  }

  test("DENSE root-group links: fractal heap + name-index v2 " +
    "b-tree round-trip, single-leaf and forced-internal (late r14)") {
    def mk(n: Int): Seq[WDataset] = (0 until n).map { i =>
      val b = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putLong(i * 31L - 4)
      WDataset(f"node$i%03d", Seq(1L), "i8", b.array())
    }
    // 6 links: one b-tree leaf, one heap direct block
    // 120 links: internal b-tree node (leafCap 45 at nodeSize 512)
    //   and a heap block past the 512-byte start (doubles at build)
    for (n <- Seq(1, 6, 120)) {
      val f = buildLatest(mk(n), denseLinks = true)
      val ds = read(f).getOrElse(fail(s"dense n=$n rejected"))
      assert(ds.length == n, s"n=$n")
      assert(ds.map(_.path) ==
        (0 until n).map(i => f"node$i%03d"), s"names n=$n")
      (0 until n).foreach { i =>
        assert(ds(i).arr.longAt(0) == i * 31L - 4, s"val $i/$n")
      }
      // the same datasets compact vs dense: identical decode
      val compact = read(buildLatest(mk(n))).get
      assert(compact.map(d => (d.path, d.dims)) ==
        ds.map(d => (d.path, d.dims)), s"compact twin n=$n")
    }
  }

  test("DENSE links reject on any structural damage — heap/btree " +
    "checksums, truncated ids, filtered heaps (late r14)") {
    val f = buildLatest((0 until 30).map { i =>
      WDataset(f"x$i%02d", Seq(1L), "i4",
        Array[Byte](i.toByte, 0, 0, 0))
    }, denseLinks = true)
    assert(read(f).isDefined)
    // locate FRHP and BTHD and corrupt each structure's bytes
    def find(sig: String): Int = {
      val s = sig.getBytes("US-ASCII")
      (0 until f.length - 4).find(i => f(i) == s(0) &&
        f(i + 1) == s(1) && f(i + 2) == s(2) && f(i + 3) == s(3))
        .getOrElse(fail(s"$sig not found"))
    }
    for (sig <- Seq("FRHP", "FHDB", "BTHD", "BTLF")) {
      val at = find(sig)
      // damage a byte INSIDE the structure (past the signature)
      for (off <- Seq(5, 9, 17, 40)) {
        val c = f.clone()
        c(at + off) = (c(at + off) ^ 0x5a).toByte
        assert(read(c).isEmpty, s"$sig corrupt at +$off accepted")
      }
    }
    // flipping the io-filter length on the heap header must reject
    val c2 = f.clone()
    val hp = find("FRHP")
    c2(hp + 7) = 4
    assert(read(c2).isEmpty, "filtered heap accepted")
  }

  test("mutation fuzz: corruptions never throw") {
    val base = build(Seq(
      WDataset("a", Seq(6L), "i4",
        Array.tabulate(24)(i => (i * 3).toByte)),
      WDataset("b", Seq(3L, 2L), "f8", {
        val bb = java.nio.ByteBuffer.allocate(48)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        (0 until 6).foreach(i => bb.putDouble(i * 0.25))
        bb.array()
      }, chunkDims = Seq(2, 2))))
    val rnd = new scala.util.Random(83)
    (0 until 500).foreach { _ =>
      val m = base.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      read(m)
    }
    // the libver-latest parse paths under the same hammer
    val latest = buildLatest(Seq(
      WDataset("a", Seq(6L), "i4",
        Array.tabulate(24)(i => (i * 3).toByte)),
      WDataset("b", Seq(3L, 2L), "f8", {
        val bb = java.nio.ByteBuffer.allocate(48)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        (0 until 6).foreach(i => bb.putDouble(i * 0.25))
        bb.array()
      }, chunkDims = Seq(2, 2), shuffle = true, fletcher = true)))
    (0 until 500).foreach { _ =>
      val m = latest.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      read(m)
    }
    (0 until 200).foreach { _ =>
      read(Array.fill(rnd.nextInt(200))(rnd.nextInt().toByte))
    }
  }
}
