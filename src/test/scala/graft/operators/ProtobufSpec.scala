package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Protobuf wire-format pins: a hand-computed byte-exact Example
  * layout, exact round trips over every feature kind (packed
  * emission), spec-mandated acceptance of UNPACKED numeric repeats,
  * unknown-field skipping at every nesting level, varint edges
  * (Long.MaxValue, negatives as 10-byte varints), group-tag and
  * truncation rejection, garbage fuzz (never throws, never invents),
  * and FULL differentials against the protobuf runtime Spark bundles
  * inside orc-core (shaded `org.apache.orc.protobuf`): their
  * CodedOutputStream → our parser, our builder → their
  * CodedInputStream. */
class ProtobufSpec extends AnyFunSuite {

  import Protobuf._

  private def ex(fs: (String, FeatureVal)*): Array[Byte] =
    buildExample(fs)

  private def assertSame(got: Seq[(String, FeatureVal)],
      want: Seq[(String, FeatureVal)]): Unit = {
    assert(got.map(_._1) == want.map(_._1))
    for (((_, g), (_, w)) <- got.zip(want)) (g, w) match {
      case (BytesVals(a), BytesVals(b)) =>
        assert(a.length == b.length)
        for ((x, y) <- a.zip(b)) assert(x.sameElements(y))
      case (FloatVals(a), FloatVals(b)) =>
        assert(a.map(java.lang.Float.floatToIntBits) ==
          b.map(java.lang.Float.floatToIntBits))
      case (IntVals(a), IntVals(b)) => assert(a == b)
      case _ => fail("feature kind mismatch")
    }
  }

  test("hand-pinned byte layout: one int64 feature") {
    // Int64List{[1]} -> [0a 01 01]; Feature{int64_list=3} ->
    // [1a 03 ...]; map entry {key="a", value} ->
    // [0a 01 61 12 05 ...]; Features.feature=1 wraps the 10-byte
    // entry; Example.features=1 wraps the 12-byte Features.
    val got = buildExample(Seq("a" -> IntVals(Seq(1L))))
    val want = Array(
      0x0a, 0x0c, 0x0a, 0x0a, 0x0a, 0x01, 0x61, 0x12, 0x05, 0x1a,
      0x03, 0x0a, 0x01, 0x01).map(_.toByte)
    assert(got.sameElements(want))
    assertSame(parseExample(got).get, Seq("a" -> IntVals(Seq(1L))))
  }

  test("round trip: all three kinds, multi-value, empty lists") {
    val fs = Seq(
      "id" -> IntVals(Seq(42L, -1L, Long.MaxValue, Long.MinValue, 0L)),
      "text" -> BytesVals(Seq("héllo".getBytes("UTF-8"), Array[Byte](),
        Array.tabulate[Byte](300)(_.toByte))),
      "score" -> FloatVals(Seq(0f, -0f, 1.5f, Float.MaxValue,
        Float.NegativeInfinity, Float.NaN)),
      "empty_ints" -> IntVals(Seq.empty),
      "empty_bytes" -> BytesVals(Seq.empty))
    assertSame(parseExample(ex(fs: _*)).get, fs)
  }

  test("unpacked numeric repeats parse identically to packed") {
    // Hand-encode Int64List{3, 300} as per-element varints
    // (field 1, wire 0 -> tag 0x08) and FloatList{1.0f} as a
    // per-element fixed32 (field 1, wire 5 -> tag 0x0d).
    val il = Array(0x08, 0x03, 0x08, 0xac, 0x02).map(_.toByte)
    val bits = java.lang.Float.floatToIntBits(1.0f)
    val fl = Array[Byte](0x0d.toByte, (bits & 0xff).toByte,
      ((bits >> 8) & 0xff).toByte, ((bits >> 16) & 0xff).toByte,
      ((bits >> 24) & 0xff).toByte)
    def feature(kindField: Int, payload: Array[Byte]): Array[Byte] =
      Array(((kindField << 3) | 2).toByte, payload.length.toByte) ++ payload
    def entry(name: String, feat: Array[Byte]): Array[Byte] = {
      val nb = name.getBytes("UTF-8")
      Array[Byte](0x0a, nb.length.toByte) ++ nb ++
        Array[Byte](0x12, feat.length.toByte) ++ feat
    }
    val e1 = entry("i", feature(3, il))
    val e2 = entry("f", feature(2, fl))
    val feats = Array[Byte](0x0a, e1.length.toByte) ++ e1 ++
      Array[Byte](0x0a, e2.length.toByte) ++ e2
    val bytes = Array[Byte](0x0a, feats.length.toByte) ++ feats
    assertSame(parseExample(bytes).get, Seq(
      "i" -> IntVals(Seq(3L, 300L)), "f" -> FloatVals(Seq(1.0f))))
  }

  test("unknown fields are skipped at every level") {
    val base = ex("k" -> IntVals(Seq(7L)))
    // append unknown top-level fields: varint #9, fixed64 #10,
    // LEN #11, fixed32 #12
    val extra = Array(
      0x48, 0x05,
      0x51, 1, 2, 3, 4, 5, 6, 7, 8,
      0x5a, 0x02, 0xff, 0xee,
      0x65, 9, 9, 9, 9).map(_.toByte)
    assertSame(parseExample(base ++ extra).get,
      Seq("k" -> IntVals(Seq(7L))))
    // an empty Feature (no kind) keeps its name with empty ints:
    // entry {key="z", value=<empty>}
    val e = Array(0x0a, 0x01, 0x7a, 0x12, 0x00).map(_.toByte)
    val feats = Array[Byte](0x0a, e.length.toByte) ++ e
    val bytes = Array[Byte](0x0a, feats.length.toByte) ++ feats
    assertSame(parseExample(bytes).get, Seq("z" -> IntVals(Seq.empty)))
  }

  test("negative int64 is a 10-byte varint on the wire") {
    val b = ex("n" -> IntVals(Seq(-1L)))
    // locate: the packed payload of -1 is ten 0xff.. bytes ending 0x01
    val tail = b.takeRight(10)
    assert(tail.take(9).forall(x => (x & 0xff) == 0xff) &&
      (tail.last & 0xff) == 0x01)
    assertSame(parseExample(b).get, Seq("n" -> IntVals(Seq(-1L))))
  }

  test("group tags, truncation and garbage reject cleanly") {
    // wire type 3 (start group) at top level
    assert(parseExample(Array[Byte](0x0b)).isEmpty)
    // truncated LEN
    assert(parseExample(Array[Byte](0x0a, 0x7f, 0x01)).isEmpty)
    // truncation of every valid prefix either parses a prefix-set of
    // features or rejects — never throws
    val full = ex("a" -> IntVals(Seq(1L, 2L)), "b" -> BytesVals(Seq(
      "xyz".getBytes("UTF-8"))))
    for (n <- 0 until full.length)
      parseExample(full.take(n)) // must not throw
    val rnd = new scala.util.Random(0xbeef)
    for (_ <- 0 until 2000) {
      val junk = Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      parseExample(junk) // must not throw
      fieldWalk(junk)    // must not throw
    }
    // 11-byte varint (overlong) rejects
    assert(fieldWalk(Array.fill[Byte](11)(0x80.toByte) :+ 0x01.toByte)
      .isEmpty)
  }

  test("fieldWalk pins field numbers, wire types and value widths") {
    val b = ex("a" -> IntVals(Seq(1L)))
    // top level: a single LEN field #1 whose value is len-prefix + 12
    assert(fieldWalk(b).get == Seq((1, 2, b.length - 1)))
    val mixed = Array(
      0x08, 0x96, 0x01, // #1 varint 150 (the spec's own example)
      0x15, 1, 2, 3, 4, // #2 fixed32
      0x19, 1, 2, 3, 4, 5, 6, 7, 8, // #3 fixed64
      0x22, 0x03, 0x61, 0x62, 0x63 // #4 LEN "abc"
    ).map(_.toByte)
    assert(fieldWalk(mixed).get ==
      Seq((1, 0, 2), (2, 5, 4), (3, 1, 8), (4, 2, 4)))
  }

  test("differential: their CodedOutputStream -> our parser") {
    import org.apache.orc.protobuf.{CodedOutputStream, ByteString}
    // Build the same Example with the bundled runtime's low-level
    // writer (packed lists, nested LEN framing sized via compute*).
    val ints = Seq(5L, -5L, 1L << 40)
    var packedLen = 0
    ints.foreach(v => packedLen += CodedOutputStream.computeInt64SizeNoTag(v))
    val ilBuf = new java.io.ByteArrayOutputStream()
    val il = CodedOutputStream.newInstance(ilBuf)
    il.writeTag(1, 2); il.writeUInt32NoTag(packedLen)
    ints.foreach(il.writeInt64NoTag)
    il.flush()
    val featBuf = new java.io.ByteArrayOutputStream()
    val ft = CodedOutputStream.newInstance(featBuf)
    ft.writeTag(3, 2); ft.writeUInt32NoTag(ilBuf.size())
    ft.flush(); featBuf.write(ilBuf.toByteArray)
    val entryBuf = new java.io.ByteArrayOutputStream()
    val en = CodedOutputStream.newInstance(entryBuf)
    en.writeString(1, "ids")
    en.writeTag(2, 2); en.writeUInt32NoTag(featBuf.size())
    en.flush(); entryBuf.write(featBuf.toByteArray)
    val featsBuf = new java.io.ByteArrayOutputStream()
    val fs = CodedOutputStream.newInstance(featsBuf)
    fs.writeBytes(1, ByteString.copyFrom(entryBuf.toByteArray))
    fs.flush()
    val exBuf = new java.io.ByteArrayOutputStream()
    val e = CodedOutputStream.newInstance(exBuf)
    e.writeBytes(1, ByteString.copyFrom(featsBuf.toByteArray))
    e.flush()
    assertSame(parseExample(exBuf.toByteArray).get,
      Seq("ids" -> IntVals(ints)))
    // and byte-identical to our builder (both emit packed,
    // deterministic order)
    assert(exBuf.toByteArray.sameElements(
      buildExample(Seq("ids" -> IntVals(ints)))))
  }

  test("differential: our builder -> their CodedInputStream") {
    import org.apache.orc.protobuf.CodedInputStream
    val fsIn = Seq(
      "t" -> BytesVals(Seq("abc".getBytes("UTF-8"))),
      "s" -> FloatVals(Seq(2.5f, -8f)),
      "i" -> IntVals(Seq(9L, -9L)))
    val bytes = buildExample(fsIn)
    val top = CodedInputStream.newInstance(bytes)
    assert(top.readTag() == ((1 << 3) | 2))
    val feats = CodedInputStream.newInstance(top.readByteArray())
    val got = Seq.newBuilder[(String, FeatureVal)]
    while (!feats.isAtEnd) {
      assert(feats.readTag() == ((1 << 3) | 2))
      val entry = CodedInputStream.newInstance(feats.readByteArray())
      assert(entry.readTag() == ((1 << 3) | 2))
      val name = entry.readString()
      assert(entry.readTag() == ((2 << 3) | 2))
      val feat = CodedInputStream.newInstance(entry.readByteArray())
      val kindTag = feat.readTag()
      val kind = kindTag >>> 3
      val list = CodedInputStream.newInstance(feat.readByteArray())
      assert(list.readTag() == ((1 << 3) | 2))
      val fv: FeatureVal = kind match {
        case 1 => BytesVals(Seq(list.readByteArray()))
        case 2 =>
          val packed = CodedInputStream.newInstance(list.readByteArray())
          val vs = Seq.newBuilder[Float]
          while (!packed.isAtEnd) vs += packed.readFloat()
          FloatVals(vs.result())
        case 3 =>
          val packed = CodedInputStream.newInstance(list.readByteArray())
          val vs = Seq.newBuilder[Long]
          while (!packed.isAtEnd) vs += packed.readInt64()
          IntVals(vs.result())
      }
      got += ((name, fv))
    }
    assertSame(got.result(), fsIn)
  }

  test("SequenceExample: round trip, empty parts, step order") {
    val ctx = Seq(
      "id" -> IntVals(Seq(42L)),
      "tag" -> BytesVals(Seq("xy".getBytes("UTF-8"))))
    val lists = Seq(
      "words" -> Seq(BytesVals(Seq("a".getBytes)),
        BytesVals(Seq("bb".getBytes)), BytesVals(Seq("ccc".getBytes))),
      "scores" -> Seq(FloatVals(Seq(1.5f, 2f)), FloatVals(Seq(-3f))),
      "empty" -> Seq.empty[FeatureVal])
    val bytes = buildSequenceExample(ctx, lists)
    val (gotCtx, gotLists) = parseSequenceExample(bytes).get
    assertSame(gotCtx, ctx)
    assert(gotLists.map(_._1) == Seq("words", "scores", "empty"))
    assert(gotLists(0)._2.map(
      _.asInstanceOf[BytesVals].vs.head.toSeq) ==
      Seq("a", "bb", "ccc").map(_.getBytes.toSeq))
    assert(gotLists(1)._2 ==
      Seq(FloatVals(Seq(1.5f, 2f)), FloatVals(Seq(-3f))))
    assert(gotLists(2)._2.isEmpty)
    // both halves optional: an Example body is a valid (context-only)
    // SequenceExample prefix shape and vice versa
    val (c2, l2) = parseSequenceExample(
      buildSequenceExample(Nil, Nil)).get
    assert(c2.isEmpty && l2.isEmpty)
  }

  test("SequenceExample differential: our builder -> their reader") {
    import org.apache.orc.protobuf.CodedInputStream
    val bytes = buildSequenceExample(
      Seq("id" -> IntVals(Seq(7L))),
      Seq("steps" -> Seq(IntVals(Seq(10L)), IntVals(Seq(20L, 30L)))))
    val top = CodedInputStream.newInstance(bytes)
    // context = 1: Features with one entry "id"
    assert(top.readTag() == ((1 << 3) | 2))
    val feats = CodedInputStream.newInstance(top.readByteArray())
    assert(feats.readTag() == ((1 << 3) | 2))
    val entry = CodedInputStream.newInstance(feats.readByteArray())
    assert(entry.readTag() == ((1 << 3) | 2))
    assert(entry.readString() == "id")
    // feature_lists = 2: one entry "steps" with two Features
    assert(top.readTag() == ((2 << 3) | 2))
    val fls = CodedInputStream.newInstance(top.readByteArray())
    assert(fls.readTag() == ((1 << 3) | 2))
    val flEntry = CodedInputStream.newInstance(fls.readByteArray())
    assert(flEntry.readTag() == ((1 << 3) | 2))
    assert(flEntry.readString() == "steps")
    assert(flEntry.readTag() == ((2 << 3) | 2))
    val fl = CodedInputStream.newInstance(flEntry.readByteArray())
    val stepSums = Seq.newBuilder[Long]
    while (!fl.isAtEnd) {
      assert(fl.readTag() == ((1 << 3) | 2))
      val feat = CodedInputStream.newInstance(fl.readByteArray())
      assert(feat.readTag() == ((3 << 3) | 2)) // int64_list
      val il = CodedInputStream.newInstance(feat.readByteArray())
      assert(il.readTag() == ((1 << 3) | 2)) // packed
      val packed = CodedInputStream.newInstance(il.readByteArray())
      var sum = 0L
      while (!packed.isAtEnd) sum += packed.readInt64()
      stepSums += sum
    }
    assert(stepSums.result() == Seq(10L, 50L))
  }

  test("SequenceExample: unknown fields skip, garbage rejects") {
    val good = buildSequenceExample(
      Seq("a" -> IntVals(Seq(1L))),
      Seq("l" -> Seq(IntVals(Seq(2L)))))
    // prepend an unknown top-level field 9 (varint)
    val withUnknown = Array[Byte]((9 << 3).toByte, 0x2a) ++ good
    val (c, l) = parseSequenceExample(withUnknown).get
    assert(c.map(_._1) == Seq("a") && l.map(_._1) == Seq("l"))
    // group tag rejects
    assert(parseSequenceExample(Array[Byte]((1 << 3 | 3).toByte)).isEmpty)
    val rnd = new scala.util.Random(0x5e07e)
    for (_ <- 0 until 2000) {
      val junk = Array.fill(rnd.nextInt(48))(rnd.nextInt().toByte)
      parseSequenceExample(junk) // must not throw
    }
    for (_ <- 0 until 500) {
      val bad = good.clone()
      bad(rnd.nextInt(bad.length)) = rnd.nextInt().toByte
      parseSequenceExample(bad) // reject or in-shape, never throw
    }
  }
}
