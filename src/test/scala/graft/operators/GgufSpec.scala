package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** GGUF pins: the spec's v3 header layout, every metadata value
  * type round-tripping byte-exact (incl. one-level arrays and the
  * u64-above-Long case), ggml-order dims, alignment handling (the
  * default 32 and a custom `general.alignment`), canonical offset
  * tiling, Q8_0 quantize/dequantize arithmetic with its error
  * bound, honest rejection of table-quantized types, and fuzz. */
class GgufSpec extends AnyFunSuite {

  import Gguf._

  private def f32Bytes(xs: Float*): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(xs.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    xs.foreach(b.putFloat); b.array()
  }

  test("hand-pinned header: magic, version, counts, alignment") {
    val t = GTensor("w", Seq(2L), "F32", f32Bytes(1.5f, -2f))
    val bytes = build(Seq("k" -> GvStr("v")), Seq(t))
    assert(new String(bytes, 0, 4, "ASCII") == "GGUF")
    assert(bytes(4) == 3 && bytes(5) == 0) // version 3 LE
    // u64 tensor count = 1 at offset 8; u64 kv count = 1 at 16
    assert(bytes(8) == 1 && bytes(16) == 1)
    val (kvs, ts) = parse(bytes).get
    assert(kvs == Seq("k" -> GvStr("v")))
    assert(ts.head.name == "w" && ts.head.dims == Seq(2L))
    assert(f32At(ts.head, 0) == 1.5f && f32At(ts.head, 1) == -2f)
    // data section starts on a 32-boundary
    assert((bytes.length - 8) % 4 == 0)
  }

  test("every metadata value type round-trips byte-exact") {
    val md = Seq(
      "u8" -> GvU8(255), "i8" -> GvI8(-128),
      "u16" -> GvU16(65535), "i16" -> GvI16(-32768),
      "u32" -> GvU32(0xffffffffL), "i32" -> GvI32(Int.MinValue),
      "f32" -> GvF32(1.25f), "bool" -> GvBool(true),
      "s" -> GvStr("héllo"),
      "arr_i32" -> GvArr(5, Seq(GvI32(1), GvI32(-2), GvI32(3))),
      "arr_str" -> GvArr(8, Seq(GvStr("a"), GvStr("bb"))),
      "arr_f64" -> GvArr(12, Seq(GvF64(0.5), GvF64(-0.25))),
      "u64" -> GvU64(-1L), // 2^64-1 raw bits
      "i64" -> GvI64(Long.MinValue), "f64" -> GvF64(math.Pi))
    val t = GTensor("x", Seq(1L), "I8", Array[Byte](7))
    val bytes = build(md, Seq(t))
    val (kvs, _) = parse(bytes).get
    assert(kvs == md)
    // byte-exact: rebuilding from the parse reproduces the file
    val (kvs2, ts2) = parse(bytes).get
    assert(build(kvs2, ts2).sameElements(bytes))
  }

  test("multi-tensor file: ggml dims, offsets tile with padding") {
    // 3-element F32 = 12 bytes → next offset aligns to 32
    val a = GTensor("a", Seq(3L), "F32", f32Bytes(1f, 2f, 3f))
    val b = GTensor("b", Seq(4L, 2L), "I64", {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (1L to 8L).foreach(bb.putLong); bb.array()
    })
    val bytes = build(Seq.empty, Seq(a, b))
    val (_, ts) = parse(bytes).get
    assert(ts.map(_.name) == Seq("a", "b"))
    assert(ts(1).dims == Seq(4L, 2L)) // ggml order preserved
    assert(i64At(ts(1), 7) == 8L)
  }

  test("custom general.alignment is honoured") {
    val t1 = GTensor("a", Seq(1L), "F32", f32Bytes(9f))
    val t2 = GTensor("b", Seq(1L), "F32", f32Bytes(8f))
    val bytes = build(Seq("general.alignment" -> GvU32(64)),
      Seq(t1, t2), alignment = 64)
    val (_, ts) = parse(bytes).get
    assert(ts.length == 2 && f32At(ts(1), 0) == 8f)
    // a non-power-of-two alignment KV rejects
    val bad = build(Seq("general.alignment" -> GvU32(64)),
      Seq(t1), alignment = 64)
    // patch the KV value 64 → 48 (same byte length)
    val idx = {
      var i = 0
      var found = -1
      while (found < 0 && i < bad.length - 4) {
        if (bad(i) == 64 && bad(i + 1) == 0 && bad(i + 2) == 0 &&
          bad(i + 3) == 0 && i > 30) found = i
        i += 1
      }
      found
    }
    assert(idx > 0)
    val patched = bad.clone(); patched(idx) = 48
    assert(parse(patched).isEmpty)
  }

  test("Q8_0: quantize/dequantize arithmetic and error bound") {
    val rnd = new scala.util.Random(5)
    val xs = Array.fill(128)((rnd.nextFloat() - 0.5f) * 20f)
    val q = quantizeQ8_0(xs)
    assert(q.length == 128 / 32 * 34)
    val back = dequantizeQ8_0(q)
    assert(back.length == 128)
    // per-block error ≤ d/2 + f16 scale rounding slack
    var b = 0
    while (b < 128) {
      val amax = (b until b + 32).map(i => math.abs(xs(i))).max
      val d = Safetensors.halfToFloat(
        Safetensors.floatToHalf(amax / 127f) & 0xffff)
      (b until b + 32).foreach { i =>
        assert(math.abs(back(i) - xs(i)) <= d * 0.51 + 1e-7,
          s"lane $i: ${xs(i)} -> ${back(i)} (d=$d)")
      }
      b += 32
    }
    // all-zero block: zero scale, exact zeros back
    val z = dequantizeQ8_0(quantizeQ8_0(new Array[Float](32)))
    assert(z.forall(_ == 0f))
    // a Q8_0 tensor travels through the container
    val t = GTensor("q", Seq(32L, 4L), "Q8_0", quantizeQ8_0(xs))
    val (_, ts) = parse(build(Seq.empty, Seq(t))).get
    assert(ts.head.tpe == "Q8_0" &&
      dequantizeQ8_0(ts.head.data).sameElements(back))
  }

  test("malformed inputs reject, never throw") {
    val ok = build(Seq("k" -> GvI32(1)),
      Seq(GTensor("w", Seq(2L), "F32", f32Bytes(1f, 2f))))
    assert(parse(Array.emptyByteArray).isEmpty)
    assert(parse(ok.take(12)).isEmpty)
    assert(parse(ok.dropRight(1)).isEmpty)  // truncated data
    assert(parse(ok :+ 0.toByte).isEmpty)   // trailing bytes
    val magic = ok.clone(); magic(0) = 'X'
    assert(parse(magic).isEmpty)
    val ver = ok.clone(); ver(4) = 2       // v2 rejects honestly
    assert(parse(ver).isEmpty)
    // table-quantized type id (Q4_K = 12) rejects
    val bytes = build(Seq.empty,
      Seq(GTensor("w", Seq(32L), "Q8_0",
        quantizeQ8_0(new Array[Float](32)))))
    // find the type id 8 right before the u64 offset 0 at the end
    // of the info record: patch it to 12
    var i = bytes.length - 1
    var patched: Array[Byte] = null
    while (patched == null && i > 4) {
      if (bytes(i) == 8 && i + 12 <= bytes.length) {
        val c = bytes.clone(); c(i) = 12
        if (parse(c).isEmpty && parse(bytes).isDefined) patched = c
      }
      i -= 1
    }
    assert(patched != null)
    // unknown metadata value type rejects
    assertThrows[IllegalArgumentException](
      build(Seq.empty, Seq(GTensor("w", Seq(0L), "F32",
        Array.emptyByteArray)))) // zero dim
  }

  test("mutation fuzz: corruptions never throw") {
    val base = build(
      Seq("arch" -> GvStr("graft"),
        "toks" -> GvArr(8, Seq(GvStr("a"), GvStr("b")))),
      Seq(GTensor("emb", Seq(4L, 2L), "F32",
        f32Bytes(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)),
        GTensor("ids", Seq(2L), "I64", {
          val bb = java.nio.ByteBuffer.allocate(16)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.putLong(1L); bb.putLong(2L); bb.array()
        })))
    assert(parse(base).isDefined)
    val rnd = new scala.util.Random(41)
    (0 until 500).foreach { _ =>
      val m = base.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      parse(m)
    }
    (0 until 200).foreach { _ =>
      parse(Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte))
    }
  }
}
