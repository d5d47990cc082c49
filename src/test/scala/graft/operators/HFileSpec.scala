package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** HFile container pins: build → parse round trips across codecs
  * and block splits (multi-block root index), byte-structure
  * asserts (trailer magic + version int, data/index block magics,
  * CRC32C chunk checksums), and loud rejection of corruption,
  * truncation and unsupported codecs; multi-level (root -> leaf)
  * index trees round-trip both directions as of late r14. */
class HFileSpec extends AnyFunSuite {

  private def cells(n: Int): Seq[(Array[Byte], Array[Byte])] =
    (0 until n).map { i =>
      (f"key-$i%06d".getBytes("UTF-8"),
        s"value-$i-${"x" * (i % 23)}".getBytes("UTF-8"))
    }

  test("round trip: codecs, multi-block, 0/1-cell edges") {
    for (codec <- Seq("none", "gz");
         n <- Seq(0, 1, 7, 500);
         bs <- Seq(128, 65536)) {
      val cs = cells(n)
      val bytes = HFile.build(cs, codec, bs)
      val got = HFile.parse(bytes).getOrElse(
        fail(s"rejected codec=$codec n=$n bs=$bs"))
      assert(got.length == n, s"$codec/$n/$bs")
      got.zip(cs).foreach { case (g, (k, v)) =>
        assert(g.row.sameElements(k) && g.value.sameElements(v))
      }
    }
    // multi-block really happened: 500 cells at 128B blocks
    val multi = HFile.build(cells(500), "none", 128)
    def count(sig: String): Int = {
      val s = sig.getBytes("ISO-8859-1")
      (0 to multi.length - 8).count(i =>
        (0 until 8).forall(k => multi(i + k) == s(k)))
    }
    assert(count("DATABLK*") > 10)
    assert(count("IDXROOT2") == 1)
    assert(count("TRABLK\"$") == 1)
  }

  test("2-level index: root -> leaf index blocks round-trip; " +
    "3-level trees parse via intermediate blocks (late r14)") {
    // 500 cells at 128B blocks -> ~100+ data blocks; leafCap 4
    // forces dozens of IDXLEAF2 blocks behind the root
    for (codec <- Seq("none", "gz")) {
      val cs = cells(500)
      val b = HFile.build(cs, codec, 128, indexLevels = 2,
        leafIndexCap = 4)
      val got = HFile.parse(b).getOrElse(
        fail(s"2-level $codec rejected"))
      assert(got.length == 500)
      got.zip(cs).foreach { case (g, (k, v)) =>
        assert(g.row.sameElements(k) && g.value.sameElements(v))
      }
      def count(sig: String): Int = {
        val s = sig.getBytes("ISO-8859-1")
        (0 to b.length - 8).count(i =>
          (0 until 8).forall(k => b(i + k) == s(k)))
      }
      if (codec == "none") {
        assert(count("IDXLEAF2") > 10, "no leaf index blocks")
        assert(count("IDXROOT2") == 1)
      }
      // a leaf-index byte flip must be caught by its chunk CRC
      val s = "IDXLEAF2".getBytes("ISO-8859-1")
      val at = (0 to b.length - 8).find(i =>
        (0 until 8).forall(k => b(i + k) == s(k))).get
      val bad = b.clone()
      bad(at + 35) = (bad(at + 35) ^ 0x11).toByte
      assert(HFile.parse(bad).isEmpty, s"leaf corrupt ($codec)")
    }
    // depth must round-trip: trailer says 2 levels, flipping it to
    // 1 makes the root entries point at non-DATA blocks -> reject
    val b2 = HFile.build(cells(64), "none", 128, indexLevels = 2,
      leafIndexCap = 4)
    val pb = b2.length - 4096
    val lvlAt = (pb until b2.length - 2).find(i =>
      b2(i) == 0x40 && b2(i + 1) == 2).getOrElse(
      fail("levels field not found"))
    val one = b2.clone()
    one(lvlAt + 1) = 1
    assert(HFile.parse(one).isEmpty, "level lie accepted")
  }

  test("structure: version int, magics, sorted-keys requirement") {
    val b = HFile.build(cells(20), "none")
    // version int at the end: major 3
    val ver = ((b(b.length - 4) & 0xff) << 24) |
      ((b(b.length - 3) & 0xff) << 16) |
      ((b(b.length - 2) & 0xff) << 8) | (b(b.length - 1) & 0xff)
    assert((ver & 0xffffff) == 3)
    assert(new String(b, 0, 8, "ISO-8859-1") == "DATABLK*")
    // unsorted cells refuse to build
    intercept[IllegalArgumentException](HFile.build(Seq(
      ("b".getBytes, Array[Byte](1)), ("a".getBytes, Array[Byte](2)))))
    intercept[IllegalArgumentException](
      HFile.build(cells(2), "lz4"))
  }

  test("corruption and truncation reject loudly") {
    val b = HFile.build(cells(100), "gz", 256)
    assert(HFile.parse(b).isDefined)
    // flip a byte inside the first data block's payload: its
    // CRC32C chunk checksum must catch it
    val bad = b.clone()
    bad(40) = (bad(40) ^ 0x08).toByte
    assert(HFile.parse(bad).isEmpty)
    // flip the version int: unsupported major
    val bv = b.clone()
    bv(b.length - 1) = 9
    assert(HFile.parse(bv).isEmpty)
    // truncate: no trailer
    assert(HFile.parse(b.take(b.length / 2)).isEmpty)
    assert(HFile.parse(Array.emptyByteArray).isEmpty)
    // damage the trailer magic: unlocatable
    val bm = b.clone()
    val tm = "TRABLK\"$".getBytes("ISO-8859-1")
    val tAt = (0 to b.length - 8).lastIndexWhere(i =>
      (0 until 8).forall(k => bm(i + k) == tm(k)))
    bm(tAt) = 'X'
    assert(HFile.parse(bm).isEmpty)
    // garbage fuzz never throws
    val rnd = new java.util.Random(11)
    (0 until 200).foreach { _ =>
      val g = new Array[Byte](rnd.nextInt(600))
      rnd.nextBytes(g)
      HFile.parse(g): Unit
    }
  }
}
