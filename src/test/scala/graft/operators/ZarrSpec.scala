package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Zarr v2 pins: the `.zarray` metadata grammar both directions
  * (dtype marks, fill_value forms incl. NaN strings, dimension
  * separators, filters rejection, blosc rejection), all four
  * chunk compressors round-tripping byte-exact, C and F chunk
  * indexing through the shared Npy accessor, edge-chunk fill
  * padding, chunk-name grid mapping, size-mismatch rejections,
  * and fuzz. */
class ZarrSpec extends AnyFunSuite {

  import Zarr._

  private def meta2d(comp: Option[String], fortran: Boolean = false,
      big: Boolean = false, descr: String = "f4",
      fill: Double = 0.0): Meta =
    Meta(Seq(10L, 4L), Seq(3, 4), descr, big, fortran, comp,
      1, fill, ".")

  test("metadata round-trips through its own JSON") {
    val ms = Seq(
      meta2d(None),
      meta2d(Some("zlib")),
      meta2d(Some("zstd"), fortran = true),
      meta2d(Some("lz4"), big = true, descr = "i4"),
      meta2d(Some("gzip"), fill = Double.NaN),
      Meta(Seq(7L), Seq(2), "i8", bigEndian = false,
        fortran = false, None, 0, -1.0, "/"))
    ms.foreach { m =>
      val back = parseMeta(metaJson(m)).getOrElse(
        fail(s"rejected own json: ${metaJson(m)}"))
      // NaN != NaN — compare rendered forms
      assert(metaJson(back) == metaJson(m))
    }
  }

  test("metadata rejections: format, dtype, filters, blosc, order") {
    val ok = metaJson(meta2d(None))
    assert(parseMeta(ok).isDefined)
    assert(parseMeta(ok.replace("\"zarr_format\":2",
      "\"zarr_format\":3")).isEmpty)
    assert(parseMeta(ok.replace("<f4", "<f3")).isEmpty)
    assert(parseMeta(ok.replace("<f4", "|O")).isEmpty)
    // lossy/unknown filters reject; delta with a MISMATCHED dtype
    // rejects (a different accumulation width would mis-decode)
    assert(parseMeta(ok.replace("\"filters\":null",
      "\"filters\":[{\"id\":\"fixedscaleoffset\"}]")).isEmpty)
    assert(parseMeta(ok.replace("\"filters\":null",
      "\"filters\":[{\"id\":\"delta\",\"dtype\":\"<i8\"}]"))
      .isEmpty) // array dtype is <f4
    // float delta rejects (not exactly invertible); shuffle parses
    assert(parseMeta(ok.replace("\"filters\":null",
      "\"filters\":[{\"id\":\"delta\",\"dtype\":\"<f4\"}]"))
      .isEmpty)
    assert(parseMeta(ok.replace("\"filters\":null",
      "\"filters\":[{\"id\":\"shuffle\",\"elementsize\":4}]"))
      .exists(_.filters == Seq(("shuffle", 4))))
    // blosc ACCEPTS since late r12 (zarr's default compressor) —
    // but blosclz / bit-shuffle inside it still reject honestly
    assert(parseMeta(ok.replace("\"compressor\":null",
      "\"compressor\":{\"id\":\"blosc\",\"cname\":\"lz4\"}"))
      .exists(m => m.compressor.contains("blosc") &&
        m.bloscCname == "lz4"))
    assert(parseMeta(ok.replace("\"compressor\":null",
      "\"compressor\":{\"id\":\"blosc\",\"cname\":\"blosclz\"}"))
      .isEmpty)
    assert(parseMeta(ok.replace("\"compressor\":null",
      "\"compressor\":{\"id\":\"blosc\",\"cname\":\"lz4\"," +
        "\"shuffle\":2}")).isEmpty)
    assert(parseMeta(ok.replace("\"order\":\"C\"",
      "\"order\":\"X\"")).isEmpty)
    assert(parseMeta("{}").isEmpty)
    assert(parseMeta("not json").isEmpty)
  }

  test("numcodecs filter chains: delta + shuffle round-trip") {
    val rnd = new scala.util.Random(23)
    // every integer dtype through a delta→shuffle chain under
    // zlib; floats go shuffle-only (float delta rejects — cumsum
    // is not exactly invertible in float arithmetic)
    Seq("i1", "i2", "i4", "i8", "f4", "f8").foreach { descr =>
      val isz = Npy.ItemSize(descr)
      val meta = Meta(Seq(6L, 4L), Seq(3, 4), descr,
        bigEndian = descr == "i4", fortran = false,
        compressor = Some("zlib"), level = 5, fillValue = 0.0,
        dimSep = ".",
        filters =
          (if (descr.startsWith("f")) Seq.empty
           else Seq(("delta", 0))) ++ Seq(("shuffle", isz)))
      // metadata renders + parses the chain
      val back = parseMeta(metaJson(meta)).get
      assert(back.filters == meta.filters, descr)
      val raw = Array.fill(12 * isz)(rnd.nextInt().toByte)
      val arr = decodeChunk(back, encodeChunk(back, raw)).get
      assert(arr.data.sameElements(raw), descr)
    }
    // delta on monotone i8 data actually shrinks under the codec
    // (the chain is live, not a no-op)
    val m8 = Meta(Seq(512L), Seq(512), "i8", bigEndian = false,
      fortran = false, Some("zlib"), 9, 0.0, ".",
      filters = Seq(("delta", 0)))
    val mono = java.nio.ByteBuffer.allocate(512 * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 512).foreach(i => mono.putLong(1000000L + i * 7))
    val plainMeta = m8.copy(filters = Seq.empty)
    val withDelta = encodeChunk(m8, mono.array())
    val without = encodeChunk(plainMeta, mono.array())
    assert(withDelta.length < without.length)
    assert(decodeChunk(m8, withDelta).get.longAt(511) ==
      1000000L + 511 * 7)
    // integer wrap: deltas that overflow the width still decode
    val mw = Meta(Seq(3L), Seq(3), "i1", bigEndian = false,
      fortran = false, None, 0, 0.0, ".",
      filters = Seq(("delta", 0)))
    val wrapped = Array[Byte](100, -100, 100) // diffs wrap ±200
    assert(decodeChunk(mw, encodeChunk(mw, wrapped)).get
      .data.sameElements(wrapped))
  }

  test("zarr v3: metadata grammar, chunk keys, codec chains") {
    val m3 = Meta3(Seq(10L, 4L), Seq(4, 4), "f4",
      bigEndian = false, fillValue = 0.0,
      codecs = Seq(("gzip", 5)), sep = "/",
      keyEncoding = "default")
    val json = metaJsonV3(m3)
    assert(json.contains(""""zarr_format":3""") &&
      json.contains(""""data_type":"float32"""") &&
      json.contains(""""chunk_shape":[4,4]"""))
    val back = parseMetaV3(json).get
    assert(back == m3)
    // chunk keys: default c/0/1 vs the dotted v2 name
    assert(chunkKeyV3(m3, Seq(0, 1)) == "c/0/1")
    assert(chunkIndexV3(m3, "c/2/0").contains(Seq(2, 0)))
    assert(chunkIndexV3(m3, "2/0").isEmpty)   // missing c prefix
    assert(chunkIndexV3(m3, "c/9/0").isEmpty) // off the grid
    val mv2 = m3.copy(keyEncoding = "v2", sep = ".")
    assert(chunkKeyV3(mv2, Seq(1, 0)) == "1.0")
    assert(parseMetaV3(metaJsonV3(mv2)).contains(mv2))
    // rejections: sharding codec, bitshuffle blosc, v2 format,
    // group nodes, transpose-first chains
    assert(parseMetaV3(json.replace(""""zarr_format":3""",
      """"zarr_format":2""")).isEmpty)
    assert(parseMetaV3(json.replace(""""node_type":"array"""",
      """"node_type":"group"""")).isEmpty)
    assert(parseMetaV3(json.replace(""""name":"gzip"""",
      """"name":"sharding_indexed"""")).isEmpty)
    assert(parseMetaV3(json.replace(""""name":"bytes"""",
      """"name":"transpose"""")).isEmpty)
    val blosc3 = m3.copy(codecs = Seq(("blosc", 5)))
    assert(parseMetaV3(metaJsonV3(blosc3).replace(
      """"shuffle":"shuffle"""", """"shuffle":"bitshuffle""""))
      .isEmpty)
  }

  test("zarr v3: chunks round-trip through every codec chain") {
    val rnd = new scala.util.Random(31)
    // gzip / zstd+crc32c / blosc / bare-bytes chains, both endians
    val chains = Seq(
      (Seq(("gzip", 6)), false),
      (Seq(("zstd", 3), ("crc32c", 0)), false),
      (Seq(("blosc", 5)), false),
      (Seq.empty[(String, Int)], true))
    chains.foreach { case (chain, big) =>
      val m = Meta3(Seq(6L, 4L), Seq(3, 4), "f8", big, -1.0,
        chain, "/", "default")
      val raw = java.nio.ByteBuffer.allocate(12 * 8)
        .order(if (big) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until 12).foreach(i => raw.putDouble(i * 0.5))
      val stored = encodeChunkV3(m, raw.array())
      val arr = decodeChunkV3(m, stored).get
      assert(arr.at(1, 1) == 0.5 * 5, s"chain $chain")
      // a flipped byte under crc32c rejects
      if (chain.exists(_._1 == "crc32c")) {
        val bad = stored.clone()
        bad(2) = (bad(2) ^ 1).toByte
        assert(decodeChunkV3(m, bad).isEmpty)
      }
    }
    // a whole store through write2dV3 + fuzz
    val store = scala.collection.mutable.Map[String, Array[Byte]]()
    val m = Meta3(Seq(9L, 3L), Seq(4, 3), "i8", bigEndian = false,
      fillValue = -1.0, Seq(("zstd", 3), ("crc32c", 0)), "/",
      "default")
    write2dV3(m, 9L, 3, (r, c) => (r * 3 + c).toDouble,
      (k, b) => store(k) = b)
    assert(store.contains("zarr.json") && store.contains("c/0/0") &&
      store.contains("c/2/0"))
    val meta = parseMetaV3(new String(store("zarr.json"),
      "UTF-8")).get
    (0L until 9L).foreach { r =>
      val gi = (r / 4).toInt
      val arr = decodeChunkV3(meta,
        store(chunkKeyV3(meta, Seq(gi, 0)))).get
      (0 until 3).foreach(c =>
        assert(arr.at((r - gi * 4).toInt, c) == (r * 3 + c).toDouble))
    }
    (0 until 400).foreach { _ =>
      val k = Seq("c/0/0", "c/1/0", "c/2/0")(rnd.nextInt(3))
      val mangled = store(k).clone()
      mangled(rnd.nextInt(mangled.length)) = rnd.nextInt().toByte
      decodeChunkV3(meta, mangled) // never throws
    }
  }

  test("zarr v3 transpose codec: the F-order layout round-trips") {
    // zarr-python stores any Fortran-order array with a leading
    // transpose codec in v3 — order [1,0] for 2-d
    val m = Meta3(Seq(4L, 6L), Seq(4, 6), "i4",
      bigEndian = false, 0.0, Seq(("gzip", 5)), "/", "default",
      perm = Seq(1, 0))
    val json = metaJsonV3(m)
    assert(json.contains(""""name":"transpose"""") &&
      json.contains(""""order":[1,0]"""))
    assert(parseMetaV3(json).contains(m))
    val raw = java.nio.ByteBuffer.allocate(24 * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 24).foreach(raw.putInt)
    val stored = encodeChunkV3(m, raw.array())
    val arr = decodeChunkV3(m, stored).get
    (0 until 4).foreach(r => (0 until 6).foreach(c =>
      assert(arr.at(r, c) == (r * 6 + c).toDouble, s"($r,$c)")))
    // the stored layout really is transposed: decode it as a PLAIN
    // chunk of the permuted dims and check column-major placement
    val plain = m.copy(chunks = Seq(6, 4), perm = Seq.empty)
    val t = decodeChunkV3(plain, stored).get
    assert(t.at(0, 0) == 0.0 && t.at(1, 0) == 1.0 &&
      t.at(0, 1) == 6.0)
    // a 3-d rotation permutation
    val m3 = Meta3(Seq(2L, 3L, 4L), Seq(2, 3, 4), "i2",
      bigEndian = false, 0.0, Seq.empty, "/", "default",
      perm = Seq(2, 0, 1))
    val raw3 = java.nio.ByteBuffer.allocate(24 * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 24).foreach(i => raw3.putShort(i.toShort))
    val arr3 = decodeChunkV3(m3, encodeChunkV3(m3, raw3.array())).get
    (0 until 2).foreach(a => (0 until 3).foreach(b =>
      (0 until 4).foreach(c =>
        assert(arr3.at(a, b, c) == (a * 12 + b * 4 + c).toDouble))))
    // a non-permutation order rejects
    assert(parseMetaV3(json.replace(""""order":[1,0]""",
      """"order":[1,1]""")).isEmpty)
  }

  test("zarr v3 sharding: inner grids, index locations, missing " +
      "inner chunks read as fill") {
    // a 2-d shard of 6×4 holding 3×2 inner chunks (grid 2×2),
    // inner chain zstd, index crc32c-guarded at both locations
    Seq(true, false).foreach { atEnd =>
      val m = Meta3(Seq(12L, 4L), Seq(6, 4), "f8",
        bigEndian = false, fillValue = -5.0,
        codecs = Seq.empty, "/", "default",
        sharding = Some(Shard3(Seq(3, 2), innerBig = false,
          Seq(("zstd", 3)), indexCrc = true, indexAtEnd = atEnd)))
      // metadata renders + parses the sharding configuration
      val json = metaJsonV3(m)
      assert(json.contains(""""name":"sharding_indexed"""") &&
        json.contains(""""chunk_shape":[3,2]""") &&
        json.contains("\"index_location\":\"" +
          (if (atEnd) "end" else "start") + "\""), s"atEnd=$atEnd")
      val back = parseMetaV3(json).get
      assert(back == m, s"atEnd=$atEnd")
      val raw = java.nio.ByteBuffer.allocate(24 * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until 24).foreach(i => raw.putDouble(i * 0.5))
      val stored = encodeChunkV3(back, raw.array())
      val arr = decodeChunkV3(back, stored).get
      (0 until 6).foreach(r => (0 until 4).foreach(c =>
        assert(arr.at(r, c) == (r * 4 + c) * 0.5,
          s"($r,$c) atEnd=$atEnd")))
      // drop one inner chunk from the index (all-ones pair): its
      // cells read as fill value, the rest stay intact
      val nInner = 4
      val idxLen = nInner * 16 + 4
      val idxOff = if (atEnd) stored.length - idxLen else 0
      val mangled = stored.clone()
      // blank inner chunk 3 (grid (1,1) — rows 3..5, cols 2..3)
      (0 until 16).foreach(j =>
        mangled(idxOff + 3 * 16 + j) = 0xff.toByte)
      // re-checksum the index
      val crc = new java.util.zip.CRC32C()
      crc.update(mangled, idxOff, nInner * 16)
      val v = crc.getValue
      (0 until 4).foreach(j => mangled(idxOff + nInner * 16 + j) =
        ((v >>> (8 * j)) & 0xff).toByte)
      val holey = decodeChunkV3(back, mangled).get
      assert(holey.at(0, 0) == 0.0 && holey.at(2, 1) == 9 * 0.5)
      assert(holey.at(3, 2) == -5.0 && holey.at(5, 3) == -5.0)
      assert(holey.at(3, 0) == 12 * 0.5) // grid (1,0) untouched
      // a flipped index byte without re-checksumming rejects
      val bad = stored.clone()
      bad(idxOff) = (bad(idxOff) ^ 1).toByte
      assert(decodeChunkV3(back, bad).isEmpty)
    }
    // fuzz the shard parser
    val m = Meta3(Seq(8L), Seq(8), "i4", bigEndian = false, 0.0,
      Seq.empty, "/", "default",
      sharding = Some(Shard3(Seq(2), innerBig = false,
        Seq(("gzip", 5)), indexCrc = true, indexAtEnd = true)))
    val stored = encodeChunkV3(m,
      Array.tabulate(32)(i => (i * 3).toByte))
    val rnd = new scala.util.Random(59)
    (0 until 400).foreach { _ =>
      val x = stored.clone()
      x(rnd.nextInt(x.length)) = rnd.nextInt().toByte
      decodeChunkV3(m, x) // never throws
    }
  }

  test("zarr v3 transpose INSIDE the sharded inner chain (late r12)") {
    // each 3×2 inner chunk stored F-order (transpose [1,0]) behind
    // blosc, crc32c index — the chain zarr-python emits for an
    // order='F' sharded v3 array
    val m = Meta3(Seq(6L, 4L), Seq(6, 4), "i4",
      bigEndian = false, fillValue = -1.0,
      codecs = Seq.empty, "/", "default",
      sharding = Some(Shard3(Seq(3, 2), innerBig = false,
        Seq(("blosc", 5)), indexCrc = true, indexAtEnd = true,
        innerPerm = Seq(1, 0))))
    val json = metaJsonV3(m)
    assert(json.contains(""""name":"transpose"""") &&
      json.contains(""""name":"sharding_indexed""""))
    assert(parseMetaV3(json).contains(m))
    val raw = java.nio.ByteBuffer.allocate(24 * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 24).foreach(raw.putInt)
    val stored = encodeChunkV3(m, raw.array())
    val arr = decodeChunkV3(m, stored).get
    (0 until 6).foreach(r => (0 until 4).foreach(c =>
      assert(arr.at(r, c) == (r * 4 + c).toDouble, s"($r,$c)")))
    // the inner blocks really are permuted: decode the same shard
    // with innerPerm dropped and PERMUTED inner dims — inner chunk
    // (0,0) holds rows 0..2 × cols 0..1 column-major
    val plain = m.copy(sharding = m.sharding.map(_.copy(
      innerPerm = Seq.empty, innerChunks = Seq(2, 3))))
    val t = decodeChunkV3(plain.copy(chunks = Seq(4, 6),
      shape = Seq(4L, 6L)), stored).get
    // stored inner block layout: [c][r] of the logical 3×2 block —
    // first stored element is logical (0,0)=0, second (1,0)=4
    assert(t.at(0, 0) == 0.0 && t.at(0, 1) == 4.0 &&
      t.at(0, 2) == 8.0 && t.at(1, 0) == 1.0)
    // a wrong-rank inner order rejects
    assert(parseMetaV3(json.replace(""""order":[1,0]""",
      """"order":[0]""")).isEmpty)
    // fuzz: corrupted shards with inner transpose never throw
    val rnd = new scala.util.Random(61)
    (0 until 300).foreach { _ =>
      val x = stored.clone()
      x(rnd.nextInt(x.length)) = rnd.nextInt().toByte
      decodeChunkV3(m, x)
    }
  }

  test("every compressor round-trips a chunk byte-exact") {
    val rnd = new scala.util.Random(3)
    Seq(None, Some("zlib"), Some("gzip"), Some("zstd"), Some("lz4"))
      .foreach { comp =>
        val m = meta2d(comp)
        val raw = Array.fill(3 * 4 * 4)(rnd.nextInt().toByte)
        val arr = decodeChunk(m, encodeChunk(m, raw)).getOrElse(
          fail(s"chunk rejected under $comp"))
        assert(arr.data.sameElements(raw), s"$comp")
        // wrong-size stored data rejects
        assert(decodeChunk(m,
          encodeChunk(m, raw).dropRight(1)).isEmpty)
      }
  }

  test("C and F chunks index identically in logical coordinates") {
    Seq(false, true).foreach { fortran =>
      val m = meta2d(Some("zstd"), fortran = fortran)
      val buf = java.nio.ByteBuffer.allocate(3 * 4 * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      // memory order depends on the flag; values = r*10+c logically
      if (fortran)
        (0 until 4).foreach(c => (0 until 3).foreach(r =>
          buf.putFloat(r * 10f + c)))
      else
        (0 until 3).foreach(r => (0 until 4).foreach(c =>
          buf.putFloat(r * 10f + c)))
      val arr = decodeChunk(m, encodeChunk(m, buf.array())).get
      (0 until 3).foreach(r => (0 until 4).foreach(c =>
        assert(arr.at(r, c) == r * 10.0 + c, s"f=$fortran $r,$c")))
    }
  }

  test("write2d: edge chunks pad with fill_value; store reassembles") {
    val store = scala.collection.mutable.Map[String, Array[Byte]]()
    val m = Meta(Seq(10L, 4L), Seq(3, 4), "f4", bigEndian = false,
      fortran = false, Some("zlib"), 5, -1.5, ".")
    write2d(m, 10L, 4, (r, c) => r * 100.0 + c,
      (name, bytes) => { store(name) = bytes; () })
    // grid is ceil(10/3)=4 × ceil(4/4)=1 chunks + .zarray
    assert(store.keySet == Set(".zarray", "0.0", "1.0", "2.0", "3.0"))
    val back = parseMeta(new String(store(".zarray"), "UTF-8")).get
    assert(metaJson(back) == metaJson(m))
    // reassemble and check every logical cell incl. the edge pad
    val grid = back.grid
    assert(grid == Seq(4L, 1L))
    (0 until 4).foreach { gi =>
      val arr = decodeChunk(back, store(s"$gi.0")).get
      (0 until 3).foreach { r =>
        val row = gi * 3 + r
        (0 until 4).foreach { c =>
          val want = if (row < 10) row * 100.0 + c else -1.5
          assert(arr.at(r, c) == want, s"chunk $gi cell $r,$c")
        }
      }
    }
    // chunk-name mapping agrees
    assert(chunkIndex(m, "2.0").contains(Seq(2, 0)))
    assert(chunkIndex(m, "4.0").isEmpty) // out of grid
    assert(chunkIndex(m, "a.0").isEmpty)
    assert(chunkIndex(m, "1").isEmpty)   // rank mismatch
  }

  test("fuzz: corrupted chunks and metadata never throw") {
    val rnd = new scala.util.Random(7)
    val m = meta2d(Some("zstd"))
    val raw = Array.fill(48)(rnd.nextInt().toByte)
    val stored = encodeChunk(m, raw)
    (0 until 300).foreach { _ =>
      val x = stored.clone()
      x(rnd.nextInt(x.length)) = rnd.nextInt().toByte
      decodeChunk(m, x)
    }
    (0 until 200).foreach { _ =>
      decodeChunk(m, Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte))
      parseMeta(new String(
        Array.fill(rnd.nextInt(64))((rnd.nextInt(94) + 32).toByte),
        "UTF-8"))
    }
  }
}
