package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Roaring portable-format pins, DIFFERENTIAL against the
  * independently-bundled org.roaringbitmap 1.3.0 in both
  * directions — including its run-optimized serialization, which
  * exercises the 12346 cookie + run containers our writer never
  * emits — plus Delta's RoaringBitmapArray envelope, the Z85 codec
  * (the ZeroMQ spec's own test vector), the DV file blob with its
  * big-endian size/CRC framing, and mutation fuzz. */
class RoaringSpec extends AnyFunSuite {

  import Roaring._

  private def theirBytes(bm: org.roaringbitmap.RoaringBitmap)
      : Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(bm.serializedSizeInBytes())
    buf.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bm.serialize(buf)
    buf.array()
  }

  private val cases: Seq[Array[Long]] = Seq(
    Array.emptyLongArray,
    Array(0L),
    Array(0L, 1L, 2L, 3L, 65535L, 65536L, 65537L),
    (0L until 5000L).toArray, // bitmap container (card > 4096)
    (0L until 20000L by 2).toArray,
    Array(0xffffffffL),
    (0L until 300L).toArray ++ (1000000L until 1000100L).toArray,
    // a long solid run — run-optimizes on their side
    (100L until 9000L).toArray)

  test("differential: their serialization parses to the same set") {
    cases.filter(_.nonEmpty).foreach { vs =>
      val bm = new org.roaringbitmap.RoaringBitmap()
      vs.foreach(v => bm.add(v.toInt))
      // plain (12347 cookie)
      val (ours, len) = parse(theirBytes(bm)).get
      assert(len == bm.serializedSizeInBytes())
      assert(ours.values.sameElements(vs), s"plain n=${vs.length}")
      // run-optimized (12346 cookie, run containers)
      val ro = bm.clone(); ro.runOptimize()
      val (ours2, _) = parse(theirBytes(ro)).get
      assert(ours2.values.sameElements(vs), s"runopt n=${vs.length}")
    }
  }

  test("differential: our serialization deserializes over there") {
    cases.foreach { vs =>
      val bytes = serialize(vs)
      // our parse round-trips
      val (back, len) = parse(bytes).get
      assert(len == bytes.length && back.values.sameElements(vs))
      if (vs.nonEmpty) {
        val theirs = new org.roaringbitmap.RoaringBitmap()
        theirs.deserialize(java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN))
        val got = new Array[Long](theirs.getCardinality)
        var i = 0
        theirs.forEach(new org.roaringbitmap.IntConsumer {
          def accept(v: Int): Unit = {
            got(i) = v.toLong & 0xffffffffL; i += 1 }
        })
        assert(got.sorted.sameElements(vs), s"n=${vs.length}")
      }
    }
  }

  test("64-bit envelope: magic, sparse highs, membership") {
    val vs = Array(0L, 5L, 4096L, (1L << 32) | 7L, (3L << 32) | 1L)
    val bytes = serializeArray(vs)
    // magic u32 LE
    assert((bytes(0) & 0xff) == (ArrayMagic & 0xff))
    val bm = parseArray(bytes).get
    assert(bm.bitmaps.length == 4) // highs 0..3, high 2 empty
    assert(bm.cardinality == 5)
    vs.foreach(v => assert(bm.contains(v), s"member $v"))
    assert(!bm.contains(6L) && !bm.contains((2L << 32) | 7L))
    assert(!bm.contains((9L << 32) | 7L)) // beyond the array
    // trailing garbage rejects
    assert(parseArray(bytes :+ 0.toByte).isEmpty)
    assert(parseArray(bytes.dropRight(1)).isEmpty)
    assert(parseArray(Array.emptyByteArray).isEmpty)
    // empty set round-trips
    assert(parseArray(serializeArray(Array.emptyLongArray)).get
      .cardinality == 0)
  }

  test("z85: the spec's own HelloWorld vector + round trips") {
    val hello = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7,
      0x5b).map(_.toByte)
    assert(z85Encode(hello) == "HelloWorld")
    assert(z85Decode("HelloWorld").get.sameElements(hello))
    val rnd = new scala.util.Random(7)
    (1 to 30).foreach { _ =>
      val n = 4 * (1 + rnd.nextInt(20))
      val d = Array.fill(n)(rnd.nextInt().toByte)
      assert(z85Decode(z85Encode(d)).get.sameElements(d))
    }
    assert(z85Decode("abc").isEmpty)       // not 5-aligned
    assert(z85Decode("abc~~").isEmpty)     // bad alphabet
    assert(z85Decode("#####").isEmpty)     // > 2^32-1 group
  }

  test("DV file blob: version byte, BE size, CRC verified") {
    val data = serializeArray(Array(1L, 2L, 100L))
    val (file, off) = wrapDvFile(data)
    assert(file(0) == 1 && off == 1)
    assert(file.length == 1 + 4 + data.length + 4)
    // BE size at offset
    val sz = ((file(1) & 0xff) << 24) | ((file(2) & 0xff) << 16) |
      ((file(3) & 0xff) << 8) | (file(4) & 0xff)
    assert(sz == data.length)
    val bm = readDvFile(file, off, data.length).get
    assert(bm.contains(100L) && !bm.contains(3L))
    // wrong size, flipped CRC, bad version all reject
    assert(readDvFile(file, off, data.length - 1).isEmpty)
    val bad = file.clone(); bad(bad.length - 1) =
      (bad(bad.length - 1) ^ 1).toByte
    assert(readDvFile(bad, off, data.length).isEmpty)
    val badv = file.clone(); badv(0) = 2
    assert(readDvFile(badv, off, data.length).isEmpty)
  }

  test("mutation fuzz: corruptions never throw") {
    val base = serializeArray(
      (0L until 3000L by 3).toArray ++
        Array((1L << 32) | 5L, (1L << 32) | 9L))
    val rnd = new scala.util.Random(19)
    (0 until 600).foreach { _ =>
      val m = base.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      parseArray(m)
    }
    (0 until 200).foreach { _ =>
      parseArray(Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte))
      parse(Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte))
    }
  }
}
