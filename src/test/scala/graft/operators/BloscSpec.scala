package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Blosc v1 frame pins: the 16-byte header field by field, memcpy
  * frames, both split modes (classic per-byte-plane streams and the
  * dont-split bit), all four inner codecs (the zstd inner is a LIVE
  * DIFFERENTIAL — compressed by the independently-bundled encoder,
  * decoded by OUR Zstd), byte-shuffle round trips incl. tails that
  * are not a multiple of typesize, stored-stream handling,
  * multi-block frames with leftover blocks, honest rejections
  * (blosclz, bit-shuffle, unknown flags/codes), the zarr chunk
  * integration, and mutation fuzz. */
class BloscSpec extends AnyFunSuite {

  import Blosc._

  private def patterned(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 7) % 251).toByte)

  test("hand-pinned header: version, flags, sizes") {
    val data = patterned(4096)
    val f = encode(data, typesize = 4, cname = "lz4",
      shuffle = true, split = false)
    assert(f(0) == 2 && f(1) == 1) // version, versionlz
    val flags = f(2) & 0xff
    assert((flags & 0x01) == 1)    // shuffle
    assert((flags & 0x02) == 0)    // not memcpy
    assert((flags & 0x10) == 0x10) // dont-split
    assert((flags >>> 5) == 1)     // lz4
    assert((f(3) & 0xff) == 4)     // typesize
    // nbytes LE at 4, cbytes == frame length at 12
    assert((f(4) & 0xff) == 0 && (f(5) & 0xff) == 0x10)
    val cb = (f(12) & 0xff) | ((f(13) & 0xff) << 8) |
      ((f(14) & 0xff) << 16) | ((f(15) & 0xff) << 24)
    assert(cb == f.length)
    assert(decode(f, 1 << 20).get.sameElements(data))
  }

  test("all four inner codecs round-trip, split and unsplit") {
    val rnd = new scala.util.Random(11)
    // compressible data with structure per byte plane
    val data = Array.tabulate(40000)(i =>
      ((i / 4) % 17 + (i % 4) * 50).toByte)
    Seq("lz4", "zlib", "zstd", "snappy").foreach { cn =>
      Seq(true, false).foreach { split =>
        Seq(true, false).foreach { shuf =>
          val f = encode(data, typesize = 4, cname = cn,
            shuffle = shuf, split = split)
          val back = decode(f, 1 << 20)
          assert(back.isDefined && back.get.sameElements(data),
            s"$cn split=$split shuffle=$shuf")
        }
      }
    }
    // incompressible input falls back to a memcpy frame
    val noise = Array.fill(4096)(rnd.nextInt().toByte)
    val f = encode(noise, typesize = 8, cname = "lz4")
    assert((f(2) & 0x02) == 0x02)
    assert(f.length == noise.length + 16)
    assert(decode(f, 1 << 20).get.sameElements(noise))
  }

  test("multi-block frames with a leftover block") {
    // blocksize 1024 over 2500 bytes → 3 blocks, leftover 452
    val data = patterned(2500)
    Seq(true, false).foreach { split =>
      val f = encode(data, typesize = 2, cname = "zlib",
        shuffle = true, blocksize0 = 1024, split = split)
      assert(decode(f, 1 << 20).get.sameElements(data),
        s"split=$split")
    }
    // typesize that doesn't divide the tail
    val odd = patterned(1001)
    val f2 = encode(odd, typesize = 8, cname = "lz4",
      shuffle = true, blocksize0 = 256)
    assert(decode(f2, 1 << 20).get.sameElements(odd))
  }

  test("byte shuffle: transpose + tail semantics") {
    val d = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9) // 2 elems of 4 + 1
    val s = shuffleBytes(4, d)
    // plane 0 = bytes 0 of both elements, …, tail byte verbatim
    assert(s.sameElements(Array[Byte](1, 5, 2, 6, 3, 7, 4, 8, 9)))
    assert(unshuffleBytes(4, s).sameElements(d))
    assert(shuffleBytes(1, d).sameElements(d))
    val rnd = new scala.util.Random(3)
    (1 to 20).foreach { _ =>
      val n = 1 + rnd.nextInt(300)
      val t = 1 + rnd.nextInt(16)
      val x = Array.fill(n)(rnd.nextInt().toByte)
      assert(unshuffleBytes(t, shuffleBytes(t, x)).sameElements(x))
    }
  }

  test("zstd inner is a live differential against the bundled encoder") {
    // frames whose streams were compressed by zstd-jni decode
    // through OUR Zstd frame decoder inside the blosc walk
    val data = Array.tabulate(30000)(i => (i % 23).toByte)
    val f = encode(data, typesize = 1, cname = "zstd", level = 9,
      shuffle = false)
    assert(((f(2) & 0xff) >>> 5) == 4 &&
      (f(2) & 0x02) == 0) // compressed zstd frame
    assert(decode(f, 1 << 20).get.sameElements(data))
  }

  test("honest rejections: blosclz, bit-shuffle, unknown bits") {
    val data = patterned(2048)
    val ok = encode(data, typesize = 4, cname = "lz4")
    assert(decode(ok, 1 << 20).isDefined)
    val blosclz = ok.clone()
    blosclz(2) = (blosclz(2) & 0x1f).toByte // codec code → 0
    assert(decode(blosclz, 1 << 20).isEmpty)
    val bitshuf = ok.clone()
    bitshuf(2) = (bitshuf(2) | 0x04).toByte
    assert(decode(bitshuf, 1 << 20).isEmpty)
    val unknown = ok.clone()
    unknown(2) = (unknown(2) | 0x08).toByte
    assert(decode(unknown, 1 << 20).isEmpty)
    // cbytes must equal the frame length; caps enforced
    assert(decode(ok.dropRight(1), 1 << 20).isEmpty)
    assert(decode(ok :+ 0.toByte, 1 << 20).isEmpty)
    assert(decode(ok, maxOut = 10).isEmpty) // nbytes over the cap
    assert(decode(Array.emptyByteArray, 1 << 20).isEmpty)
  }

  test("zarr chunks: blosc is the default-compressor path") {
    import Zarr._
    val meta = Meta(Seq(8L, 8L), Seq(4, 4), "f8",
      bigEndian = false, fortran = false,
      compressor = Some("blosc"), level = 5, fillValue = 0.0,
      dimSep = ".", bloscCname = "lz4", bloscShuffle = 1)
    // .zarray renders the numcodecs blosc object and parses back
    val json = metaJson(meta)
    assert(json.contains(""""id":"blosc"""") &&
      json.contains(""""cname":"lz4"""") &&
      json.contains(""""shuffle":1"""))
    val parsed = parseMeta(json).get
    assert(parsed.compressor.contains("blosc") &&
      parsed.bloscCname == "lz4" && parsed.bloscShuffle == 1)
    val raw = java.nio.ByteBuffer.allocate(16 * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 16).foreach(i => raw.putDouble(i * 0.5))
    val stored = encodeChunk(parsed, raw.array())
    val arr = decodeChunk(parsed, stored).get
    assert(arr.at(1, 1) == 0.5 * 5)
    // blosclz cname and bit-shuffle reject at the metadata gate
    assert(parseMeta(json.replace(""""cname":"lz4"""",
      """"cname":"blosclz"""")).isEmpty)
    assert(parseMeta(json.replace(""""shuffle":1""",
      """"shuffle":2""")).isEmpty)
    // zstd cname goes through the differential inner path
    val mz = parsed.copy(bloscCname = "zstd")
    assert(decodeChunk(mz, encodeChunk(mz, raw.array())).get
      .at(3, 3) == 0.5 * 15)
  }

  test("mutation fuzz: corruptions never throw") {
    val base = encode(patterned(5000), typesize = 4, cname = "lz4",
      shuffle = true, blocksize0 = 1024, split = true)
    val rnd = new scala.util.Random(83)
    (0 until 600).foreach { _ =>
      val m = base.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      decode(m, 1 << 20)
    }
    (0 until 200).foreach { _ =>
      decode(Array.fill(rnd.nextInt(80))(rnd.nextInt().toByte),
        1 << 20)
    }
  }
}
