package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** NumPy `.npy`/`.npz` pins: the spec's exact v1.0 header layout
  * (magic, version, LE u16 length, dict literal, 64-alignment,
  * `\n` terminator), every dtype, both byte orders, Fortran-order
  * index mapping, the v2.0 u32-length escape, 0-d/1-d/3-d shapes,
  * rejection of pickle-bearing dtypes and malformed headers, `.npz`
  * round trips over STORED and DEFLATE members, and mutation fuzz. */
class NpySpec extends AnyFunSuite {

  import Npy._

  test("hand-pinned v1.0 layout: f4 (2,3) C order") {
    val xs = Array(1f, 2f, 3f, 4f, 5f, 6f)
    val bytes = buildF4(Seq(2, 3), xs)
    assert(new String(bytes, 0, 6, "ISO-8859-1") == "NUMPY")
    assert(bytes(6) == 1 && bytes(7) == 0)
    val hlen = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    assert((10 + hlen) % 64 == 0) // data start is 64-aligned
    assert(bytes(10 + hlen - 1) == '\n')
    val header = new String(bytes, 10, hlen, "ASCII")
    assert(header.startsWith(
      "{'descr': '<f4', 'fortran_order': False, 'shape': (2, 3), }"))
    val a = parse(bytes).get
    assert(a.descr == "f4" && !a.bigEndian && !a.fortran &&
      a.shape == Seq(2, 3))
    assert(a.floatAt(0, 0) == 1f && a.floatAt(1, 2) == 6f)
    assert(a.at(1, 0) == 4.0)
  }

  test("1-elem tuple shape renders as (n,) and round-trips") {
    val bytes = buildI8(Seq(3), Array(7L, -8L, 9L))
    val header = new String(bytes, 10,
      (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8), "ASCII")
    assert(header.contains("'shape': (3,)"))
    val a = parse(bytes).get
    assert(a.shape == Seq(3) && a.longAt(1) == -8L)
  }

  test("0-d scalar: shape () and a single element") {
    val b = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(2.5)
    val a = parse(build("f8", Seq(), b.array())).get
    assert(a.shape.isEmpty && a.at() == 2.5)
  }

  test("every dtype round-trips; integer widening is exact") {
    val rnd = new scala.util.Random(3)
    ItemSize.foreach { case (descr, isz) =>
      val data = Array.fill(4 * isz)(rnd.nextInt().toByte)
      val a = parse(build(descr, Seq(4), data)).get
      assert(a.descr == descr && a.data.sameElements(data))
      (0 until 4).foreach(i => a.at(i)) // decodes, never throws
    }
    val i2 = parse(build("i2", Seq(2),
      Array[Byte](0xff.toByte, 0x7f, 0x00, 0x80.toByte))).get
    assert(i2.at(0) == 32767.0 && i2.at(1) == -32768.0)
    val u2 = parse(build("u2", Seq(1),
      Array[Byte](0xff.toByte, 0xff.toByte))).get
    assert(u2.at(0) == 65535.0)
  }

  test("big-endian and Fortran order parse with correct indexing") {
    // hand-build a >i4 fortran (2,3) array holding 0..5 in LOGICAL
    // row-major order: memory order is column-major
    val logical = Array(0, 1, 2, 3, 4, 5)
    val mem = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    // fortran memory layout: (0,0)(1,0)(0,1)(1,1)(0,2)(1,2)
    Seq((0, 0), (1, 0), (0, 1), (1, 1), (0, 2), (1, 2)).foreach {
      case (r, c) => mem.putInt(logical(r * 3 + c))
    }
    val dict =
      "{'descr': '>i4', 'fortran_order': True, 'shape': (2, 3), }"
    val d = dict.getBytes("ASCII")
    val pad = (64 - ((10 + d.length + 1) % 64)) % 64
    val header = d ++ Array.fill(pad)(' '.toByte) :+ '\n'.toByte
    val bytes = "NUMPY".getBytes("ISO-8859-1") ++
      Array[Byte](1, 0, (header.length & 0xff).toByte,
        ((header.length >> 8) & 0xff).toByte) ++ header ++ mem.array()
    val a = parse(bytes).get
    assert(a.bigEndian && a.fortran)
    (0 until 2).foreach(r => (0 until 3).foreach(c =>
      assert(a.at(r, c) == logical(r * 3 + c).toDouble)))
  }

  test("v2.0 u32 header length parses (and build escalates when needed)") {
    // hand-build a v2 file with a small header — the length field
    // width is what's under test
    val dict =
      "{'descr': '<u1', 'fortran_order': False, 'shape': (2,), }"
    val d = dict.getBytes("ASCII")
    val pad = (64 - ((12 + d.length + 1) % 64)) % 64
    val header = d ++ Array.fill(pad)(' '.toByte) :+ '\n'.toByte
    val bytes = "NUMPY".getBytes("ISO-8859-1") ++
      Array[Byte](2, 0,
        (header.length & 0xff).toByte,
        ((header.length >> 8) & 0xff).toByte, 0, 0) ++
      header ++ Array[Byte](7, 9)
    val a = parse(bytes).get
    assert(a.descr == "u1" && a.at(1) == 9.0)
  }

  test("structured dtypes: packed record arrays round-trip") {
    // (id i8, w u2, x f8, tag S4, title U3) — packed, no padding
    val fields = Seq(("id", "<i8"), ("w", "<u2"), ("x", "<f8"),
      ("tag", "|S4"), ("title", "<U3"))
    val itemSize = 8 + 2 + 8 + 4 + 12
    val n = 5
    val buf = java.nio.ByteBuffer.allocate(n * itemSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach { i =>
      buf.putLong(i * 1000L - 3)
      buf.putShort((60000 + i).toShort) // u2 above Short.MaxValue
      buf.putDouble(i * 0.25)
      val tag = s"t$i".getBytes("ISO-8859-1")
      buf.put(tag); (tag.length until 4).foreach(_ =>
        buf.put(0.toByte))
      val title = s"d$i"
      title.foreach(c => buf.putInt(c.toInt))
      (title.length until 3).foreach(_ => buf.putInt(0))
    }
    val npy = buildStructured(fields, Seq(n), buf.array())
    // the plain parser refuses (it is not a plain dtype)
    assert(parse(npy).isEmpty)
    val rec = parseStructured(npy).get
    assert(rec.itemSize == itemSize && rec.elems == n)
    assert(rec.fields.map(_.name) ==
      Seq("id", "w", "x", "tag", "title"))
    val byName = rec.fields.map(f => f.name -> f).toMap
    (0 until n).foreach { i =>
      assert(rec.longAt(byName("id"), i) == i * 1000L - 3)
      assert(rec.longAt(byName("w"), i) == 60000L + i) // unsigned
      assert(rec.doubleAt(byName("x"), i) == i * 0.25)
      assert(rec.stringAt(byName("tag"), i) == s"t$i")
      assert(rec.stringAt(byName("title"), i) == s"d$i")
    }
    // rejections: object fields, sub-array shapes, fortran order,
    // dup names, truncation
    val objNpy = new String(npy.map(_.toChar))
    assert(parseStructured(npy.dropRight(1)).isEmpty)
    val withObj = npy.clone()
    // patch '<i8' (id field) to '|O8' in the header text
    val hdr = objNpy.indexOf("'<i8'")
    assert(hdr > 0)
    withObj(hdr + 1) = '|'; withObj(hdr + 2) = 'O'
    assert(parseStructured(withObj).isEmpty)
    assertThrows[RuntimeException](
      buildStructured(Seq(("a", "<O8")), Seq(1), Array[Byte](0)))
    // a sub-array tuple in the descr DECODES (late r12): 1 record
    // of i4[2]
    val sub = ("{'descr': [('a', '<i4', (2,))], 'fortran_order': " +
      "False, 'shape': (1,), }")
    val subHdr = sub.getBytes("ASCII") ++
      Array.fill((64 - (10 + sub.length + 1) % 64) % 64)(' '.toByte) :+
      '\n'.toByte
    val subNpy = npy.take(6) ++ // the \x93NUMPY magic
      Array[Byte](1, 0, (subHdr.length & 0xff).toByte,
        ((subHdr.length >> 8) & 0xff).toByte) ++ subHdr ++
      Array[Byte](5, 0, 0, 0, -1, -1, -1, -1)
    val subRec = parseStructured(subNpy).get
    assert(subRec.itemSize == 8 && subRec.elems == 1)
    assert(subRec.fields.head.count == 2 &&
      subRec.fields.head.subShape == Seq(2))
    assert(subRec.longAt(subRec.fields.head, 0, 0) == 5L)
    assert(subRec.longAt(subRec.fields.head, 0, 1) == -1L)
    // the ALIGNED dict form: explicit offsets with padding gaps
    // (i8 at 0, i2 at 8, f8 at 16 — 6 pad bytes —, itemsize 24)
    val adict = ("{'descr': {'names': ['a','b','c'], " +
      "'formats': ['<i8','<i2','<f8'], 'offsets': [0,8,16], " +
      "'itemsize': 24}, 'fortran_order': False, 'shape': (3,), }")
    val ahdr = adict.getBytes("ASCII") ++
      Array.fill((64 - (10 + adict.length + 1) % 64) % 64)(
        ' '.toByte) :+ '\n'.toByte
    val abody = java.nio.ByteBuffer.allocate(3 * 24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 3).foreach { i =>
      abody.putLong(i * 100L)
      abody.putShort((i + 7).toShort)
      abody.position(abody.position() + 6) // alignment pad
      abody.putDouble(i * 0.5)
    }
    val anpy = npy.take(6) ++
      Array[Byte](1, 0, (ahdr.length & 0xff).toByte,
        ((ahdr.length >> 8) & 0xff).toByte) ++ ahdr ++ abody.array()
    val arec = parseStructured(anpy).get
    assert(arec.itemSize == 24 && arec.elems == 3)
    val af = arec.fields.map(f => f.name -> f).toMap
    assert(af("b").offset == 8 && af("c").offset == 16)
    (0 until 3).foreach { i =>
      assert(arec.longAt(af("a"), i) == i * 100L)
      assert(arec.longAt(af("b"), i) == i + 7L)
      assert(arec.doubleAt(af("c"), i) == i * 0.5)
    }
    // overlapping offsets (a union dtype) reject
    val union = anpy.clone()
    val ustr = new String(union.map(_.toChar))
    val oi = ustr.indexOf("'offsets': [0,8,16]")
    assert(oi > 0)
    // patch 16 → 04 (overlaps the i8 at 0)
    union(oi + 16) = '0'; union(oi + 17) = '4'
    assert(parseStructured(union).isEmpty)
    // fuzz the structured parser too
    val rnd = new scala.util.Random(67)
    (0 until 300).foreach { _ =>
      val m = npy.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      parseStructured(m)
    }
  }

  test("structured sub-array fields and nested records (late r12)") {
    // record: (id i8, m f4[2,3], pos{ x f4, y f4, tag S2 }, n u2)
    // — the token-matrix-in-a-record shape HuggingFace-adjacent
    // dumps carry, plus one nested group flattened to pos.*
    val spec = Seq(
      FLeaf("id", "<i8"),
      FLeaf("m", "<f4", Seq(2, 3)),
      FGroup("pos", Seq(FLeaf("x", "<f4"), FLeaf("y", ">f4"),
        FLeaf("tag", "|S2"))),
      FLeaf("n", "<u2"))
    val itemSize = 8 + 4 * 6 + (4 + 4 + 2) + 2
    val n = 4
    val buf = java.nio.ByteBuffer.allocate(n * itemSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach { i =>
      buf.putLong(i * 10L)
      // m in C order: m[r][c] = i + r*10 + c*100
      (0 until 2).foreach(r => (0 until 3).foreach(c =>
        buf.putFloat(i + r * 10 + c * 100f)))
      buf.putFloat(i * 0.5f)
      // pos.y is BIG-endian inside a little-endian record
      val be = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      be.putFloat(i * 0.25f)
      buf.put(be.array())
      buf.put(s"p$i".getBytes("ISO-8859-1"))
      buf.putShort((i + 60000).toShort)
    }
    val npy = buildStructuredTree(spec, Seq(n), buf.array())
    // numpy's own header grammar: shape tuple renders single-dim
    assert(new String(npy.map(_.toChar)).contains(
      "('m', '<f4', (2, 3))"))
    val rec = parseStructured(npy).get
    assert(rec.itemSize == itemSize)
    assert(rec.fields.map(_.name) ==
      Seq("id", "m", "pos.x", "pos.y", "pos.tag", "n"))
    val f = rec.fields.map(x => x.name -> x).toMap
    assert(f("m").count == 6 && f("m").subShape == Seq(2, 3))
    assert(f("pos.x").offset == 8 + 24 && f("n").offset ==
      itemSize - 2)
    (0 until n).foreach { i =>
      assert(rec.longAt(f("id"), i) == i * 10L)
      (0 until 2).foreach(r => (0 until 3).foreach(c =>
        assert(rec.doubleAt(f("m"), i, r * 3 + c) ==
          i + r * 10 + c * 100d)))
      assert(rec.doubleAt(f("pos.x"), i) == i * 0.5)
      assert(rec.doubleAt(f("pos.y"), i) == i * 0.25)
      assert(rec.stringAt(f("pos.tag"), i) == s"p$i")
      assert(rec.longAt(f("n"), i) == i + 60000L)
    }
    // out-of-range sub-element throws (never silently reads the
    // next field)
    assertThrows[IllegalArgumentException](
      rec.doubleAt(f("m"), 0, 6))
    // a sub-array OF RECORDS (shape on a nested group) rejects
    val hdrTxt = ("{'descr': [('g', [('a', '<i2')], (2,))], " +
      "'fortran_order': False, 'shape': (1,), }")
    val h = hdrTxt.getBytes("ASCII") ++
      Array.fill((64 - (10 + hdrTxt.length + 1) % 64) % 64)(
        ' '.toByte) :+ '\n'.toByte
    val bad = npy.take(6) ++
      Array[Byte](1, 0, (h.length & 0xff).toByte,
        ((h.length >> 8) & 0xff).toByte) ++ h ++ new Array[Byte](4)
    assert(parseStructured(bad).isEmpty)
    // a header-driven count bomb rejects (sub-shape product cap)
    assertThrows[RuntimeException](buildStructuredTree(
      Seq(FLeaf("a", "<i4", Seq(100000))), Seq(1),
      new Array[Byte](400000)))
    // fuzz: corruptions never throw
    val rnd = new scala.util.Random(68)
    (0 until 300).foreach { _ =>
      val m = npy.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      parseStructured(m)
    }
  }

  test("malformed inputs reject, never throw") {
    val ok = buildF4(Seq(2), Array(1f, 2f))
    assert(parse(Array.emptyByteArray).isEmpty)
    assert(parse(ok.take(9)).isEmpty)
    assert(parse(ok.dropRight(1)).isEmpty)          // truncated body
    assert(parse(ok :+ 0.toByte).isEmpty)           // trailing bytes
    val wrongMagic = ok.clone(); wrongMagic(0) = 0x42
    assert(parse(wrongMagic).isEmpty)
    val badVer = ok.clone(); badVer(6) = 9
    assert(parse(badVer).isEmpty)
    def withDict(dict: String, body: Array[Byte]): Array[Byte] = {
      val d = dict.getBytes("ASCII")
      val header = d :+ '\n'.toByte
      "NUMPY".getBytes("ISO-8859-1") ++
        Array[Byte](1, 0, (header.length & 0xff).toByte,
          ((header.length >> 8) & 0xff).toByte) ++ header ++ body
    }
    // object dtype (pickle) rejects
    assert(parse(withDict(
      "{'descr': '|O', 'fortran_order': False, 'shape': (1,), }",
      Array[Byte](0))).isEmpty)
    // structured dtype rejects (descr not a quoted scalar)
    assert(parse(withDict(
      "{'descr': [('a', '<i4')], 'fortran_order': False, " +
        "'shape': (1,), }", Array[Byte](0, 0, 0, 0))).isEmpty)
    // '=' order mark rejects
    assert(parse(withDict(
      "{'descr': '=f4', 'fortran_order': False, 'shape': (1,), }",
      Array[Byte](0, 0, 0, 0))).isEmpty)
    // '|' on a multi-byte type rejects
    assert(parse(withDict(
      "{'descr': '|f4', 'fortran_order': False, 'shape': (1,), }",
      Array[Byte](0, 0, 0, 0))).isEmpty)
    // missing key rejects
    assert(parse(withDict(
      "{'descr': '<f4', 'shape': (1,), }",
      Array[Byte](0, 0, 0, 0))).isEmpty)
    // shape/size mismatch rejects
    assert(parse(withDict(
      "{'descr': '<f4', 'fortran_order': False, 'shape': (2,), }",
      Array[Byte](0, 0, 0, 0))).isEmpty)
    // unknown key rejects
    assert(parse(withDict(
      "{'descr': '<f4', 'fortran_order': False, 'shape': (1,), " +
        "'pad': 1, }", Array[Byte](0, 0, 0, 0))).isEmpty)
  }

  test(".npz round trip over STORED and DEFLATE members") {
    val emb = buildF4(Seq(2, 2), Array(1f, 2f, 3f, 4f))
    val ids = buildI8(Seq(2), Array(10L, 20L))
    val stored = buildNpz(Seq("emb" -> emb, "ids" -> ids))
    val got = parseNpz(stored).get.toMap
    assert(got.keySet == Set("emb", "ids"))
    assert(got("emb").floatAt(1, 0) == 3f)
    assert(got("ids").longAt(1) == 20L)
    // DEFLATE members through the same walk
    val deflated = Zip.buildArchive(Seq(
      ("emb.npy", emb, true), ("ids.npy", ids, true)))
    val got2 = parseNpz(deflated).get.toMap
    assert(got2("emb").data.sameElements(got("emb").data))
    // a non-npy member rejects the whole archive
    assert(parseNpz(Zip.buildArchive(Seq(
      ("emb.npy", emb, false),
      ("junk.txt", "hi".getBytes("UTF-8"), false)))).isEmpty)
    // duplicate names after suffix-strip reject
    assert(parseNpz(Zip.buildArchive(Seq(
      ("a.npy", emb, false), ("a", ids, false)))).isEmpty)
    assert(parseNpz(Array.emptyByteArray).isEmpty)
  }

  test("mutation fuzz: corruptions never throw") {
    val base = buildNpz(Seq(
      "x" -> buildF4(Seq(3), Array(1f, 2f, 3f)),
      "y" -> buildI8(Seq(2), Array(4L, 5L))))
    val rnd = new scala.util.Random(17)
    (0 until 300).foreach { _ =>
      val m = base.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      parseNpz(m)
    }
    val npy = buildF4(Seq(4), Array(1f, 2f, 3f, 4f))
    (0 until 300).foreach { _ =>
      val m = npy.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      parse(m)
    }
  }
}
