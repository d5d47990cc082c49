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

  private def halfBytes(x: Float): (Byte, Byte) = {
    val h = Safetensors.floatToHalf(x) & 0xffff
    ((h & 0xff).toByte, ((h >> 8) & 0xff).toByte)
  }

  test("Q4_0: hand-pinned block layout (split nibbles, -8 offset)") {
    // d = 1.0, qs[0] = 0x21 → lane0 = (1-8)·1 = -7, lane16 = (2-8)
    // = -6; qs[1..15] = 0x88 → exact zeros in both halves
    val (dl, dh) = halfBytes(1f)
    val block = Array[Byte](dl, dh, 0x21.toByte) ++
      Array.fill(15)(0x88.toByte)
    val xs = dequantizeQ4_0(block)
    assert(xs.length == 32)
    assert(xs(0) == -7f && xs(16) == -6f)
    assert((1 until 16).forall(j => xs(j) == 0f && xs(16 + j) == 0f))
  }

  test("Q5_0: hand-pinned block layout (qh 5th-bit plane)") {
    // d = 1.0; qh bits 0 and 16 set → lanes 0/16 get the high bit:
    // lane0 = ((1|0x10)-16)·1 = 1, lane16 = ((2|0x10)-16) = 2;
    // all other lanes qs=0, qh=0 → (0-16)·1 = -16
    val (dl, dh) = halfBytes(1f)
    val block = Array[Byte](dl, dh,
      0x01, 0x00, 0x01, 0x00, // qh = 0x00010001 LE
      0x21.toByte) ++ Array.fill(15)(0.toByte)
    val xs = dequantizeQ5_0(block)
    assert(xs(0) == 1f && xs(16) == 2f)
    assert((1 until 16).forall(j =>
      xs(j) == -16f && xs(16 + j) == -16f))
  }

  test("Q4_1/Q5_1: hand-pinned affine blocks (d·q + m)") {
    val (dl, dh) = halfBytes(0.5f)
    val (ml, mh) = halfBytes(2f)
    // Q4_1: qs[0] = 0x31 → lane0 = 1·0.5+2 = 2.5, lane16 = 3·0.5+2
    val b41 = Array[Byte](dl, dh, ml, mh, 0x31.toByte) ++
      Array.fill(15)(0.toByte)
    val x41 = dequantizeQ4_1(b41)
    assert(x41(0) == 2.5f && x41(16) == 3.5f && x41(1) == 2f)
    // Q5_1: qh bit 1 set → lane1 = (0|0x10)·0.5+2 = 10
    val b51 = Array[Byte](dl, dh, ml, mh,
      0x02, 0x00, 0x00, 0x00) ++ Array.fill(16)(0.toByte)
    val x51 = dequantizeQ5_1(b51)
    assert(x51(0) == 2f && x51(1) == 10f && x51(16) == 2f)
  }

  test("Q4/Q5 family: round-trip error bounds over random blocks") {
    val rnd = new scala.util.Random(17)
    val xs = Array.fill(256)((rnd.nextFloat() - 0.5f) * 16f)
    def check(tag: String, deq: Array[Float],
        blockLen: Int, data: Array[Byte]): Unit = {
      assert(data.length == 256 / 32 * blockLen, tag)
      var b = 0
      while (b < 256) {
        val d = math.abs(Safetensors.halfToFloat(
          ((data(b / 32 * blockLen) & 0xff) |
            ((data(b / 32 * blockLen + 1) & 0xff) << 8))))
        val mn = (b until b + 32).map(xs).min
        val mx = (b until b + 32).map(xs).max
        val affine = tag == "Q4_1" || tag == "Q5_1"
        val bound = if (affine)
          d * 0.52 + math.max(math.abs(mn), math.abs(mx)) * 1e-3 +
            1e-6
        else d * 1.01 + 1e-7
        (b until b + 32).foreach { i =>
          assert(math.abs(deq(i) - xs(i)) <= bound,
            s"$tag lane $i: ${xs(i)} -> ${deq(i)} (d=$d)")
        }
        b += 32
      }
    }
    check("Q4_0", dequantizeQ4_0(quantizeQ4_0(xs)), 18,
      quantizeQ4_0(xs))
    check("Q4_1", dequantizeQ4_1(quantizeQ4_1(xs)), 20,
      quantizeQ4_1(xs))
    check("Q5_0", dequantizeQ5_0(quantizeQ5_0(xs)), 22,
      quantizeQ5_0(xs))
    check("Q5_1", dequantizeQ5_1(quantizeQ5_1(xs)), 24,
      quantizeQ5_1(xs))
    // constant blocks: affine forms reproduce the value exactly
    // (d = 0, m = the value); symmetric forms land on a code
    val const = Array.fill(32)(3.25f)
    assert(dequantizeQ4_1(quantizeQ4_1(const)).forall(_ == 3.25f))
    assert(dequantizeQ5_1(quantizeQ5_1(const)).forall(_ == 3.25f))
    assert(dequantizeQ4_0(quantizeQ4_0(new Array[Float](32)))
      .forall(_ == 0f))
    assert(dequantizeQ5_0(quantizeQ5_0(new Array[Float](32)))
      .forall(_ == 0f))
  }

  test("quant tensors travel the container with correct sizes") {
    val rnd = new scala.util.Random(29)
    val xs = Array.fill(64)((rnd.nextFloat() - 0.5f) * 4f)
    val ts = Seq(
      GTensor("a", Seq(32L, 2L), "Q4_0", quantizeQ4_0(xs)),
      GTensor("b", Seq(64L), "Q4_1", quantizeQ4_1(xs)),
      GTensor("c", Seq(64L), "Q5_0", quantizeQ5_0(xs)),
      GTensor("d", Seq(64L), "Q5_1", quantizeQ5_1(xs)))
    val (_, back) = parse(build(Seq.empty, ts)).get
    assert(back.map(_.tpe) == Seq("Q4_0", "Q4_1", "Q5_0", "Q5_1"))
    assert(back.map(_.data.length) == Seq(36, 40, 44, 48))
    assert(dequantizeQ5_1(back(3).data)
      .sameElements(dequantizeQ5_1(ts(3).data)))
    // non-multiple-of-32 element counts reject for every block type
    Seq("Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0").foreach { t =>
      assert(byteSize(t, 33).isEmpty)
      assert(byteSize(t, 64).isDefined)
    }
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
    // table-quantized type id (IQ2_XXS = 16) rejects
    val bytes = build(Seq.empty,
      Seq(GTensor("w", Seq(32L), "Q8_0",
        quantizeQ8_0(new Array[Float](32)))))
    // find the type id 8 right before the u64 offset 0 at the end
    // of the info record: patch it to 16
    var i = bytes.length - 1
    var patched: Array[Byte] = null
    while (patched == null && i > 4) {
      if (bytes(i) == 8 && i + 12 <= bytes.length) {
        val c = bytes.clone(); c(i) = 16
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

  // ---------------------------------------------------------------
  // K-quants. The decoder pins below are computed BY HAND from the
  // published ggml dequant formulas over hand-assembled block bytes
  // — independent of our own quantizers, so an encode/decode pair
  // that agreed on a wrong layout would still fail here.
  // ---------------------------------------------------------------

  test("Q6_K: hand-pinned block (nibble/2-bit planes, scale walk)") {
    // d = 0.5; scales[g] = g-8; ql all 0xA7 (low nib 7, high 10);
    // qh all 0x5C (2-bit fields 0,3,1,1) → q1 = 7|0<<4 -32 = -25,
    // q2 = 7|3<<4 -32 = 23, q3 = 10|1<<4 -32 = -6, q4 = -6
    val block = Array.fill[Byte](128)(0xA7.toByte) ++
      Array.fill[Byte](64)(0x5C.toByte) ++
      (0 until 16).map(g => (g - 8).toByte).toArray ++ {
        val (l, h) = halfBytes(0.5f); Array(l, h)
      }
    assert(block.length == 210)
    val xs = dequantizeQ6_K(block)
    assert(xs(0) == 100f)     // 0.5 * -8 * -25
    assert(xs(16) == 87.5f)   // 0.5 * -7 * -25
    assert(xs(32) == -69f)    // 0.5 * -6 * 23
    assert(xs(64) == 12f)     // 0.5 * -4 * -6
    assert(xs(96) == 6f)      // 0.5 * -2 * -6
    assert(xs(128) == 0f)     // scales[8] = 0
    assert(xs(144) == -12.5f) // 0.5 * 1 * -25 (second 128-run)
    assert(xs(255) == -21f)   // 0.5 * 7 * -6
  }

  private val kScalesPin = Array[Byte](0x81.toByte, 2, 3, 4, 2, 3,
    4, 0xC5.toByte, 0x65, 0x76, 0x87.toByte, 0x28)
  // decodes to sc = [1,2,3,4,37,6,7,8], m = [2,3,4,5,6,7,8,50] —
  // exercises both the j<4 direct bytes and the j≥4 split-nibble +
  // high-2-bit paths of the shared 12-byte packing

  test("Q4_K: hand-pinned block (6-bit scale/min packing)") {
    val (dl, dh) = halfBytes(0.5f)
    val (ml, mh) = halfBytes(0.25f)
    val block = Array[Byte](dl, dh, ml, mh) ++ kScalesPin ++
      Array.fill[Byte](128)(0xB3.toByte) // low nib 3, high 11
    assert(block.length == 144)
    val xs = dequantizeQ4_K(block)
    assert(xs(0) == 1f)       // 0.5*1*3 - 0.25*2
    assert(xs(32) == 10.25f)  // 0.5*2*11 - 0.25*3
    assert(xs(64) == 3.5f)    // 0.5*3*3 - 0.25*4
    assert(xs(128) == 54f)    // 0.5*37*3 - 0.25*6 (high-2-bit sc)
    assert(xs(255) == 31.5f)  // 0.5*8*11 - 0.25*50 (high-2-bit m)
  }

  test("Q5_K: hand-pinned block (qh bit plane per 32-group)") {
    val (dl, dh) = halfBytes(0.5f)
    val (ml, mh) = halfBytes(0.25f)
    val block = Array[Byte](dl, dh, ml, mh) ++ kScalesPin ++
      Array.fill[Byte](32)(0x0F.toByte) ++ // groups 0..3 get +16
      Array.fill[Byte](128)(0xB3.toByte)
    assert(block.length == 176)
    val xs = dequantizeQ5_K(block)
    assert(xs(0) == 9f)       // 0.5*1*(3+16) - 0.25*2
    assert(xs(32) == 26.25f)  // 0.5*2*(11+16) - 0.25*3
    assert(xs(128) == 54f)    // group 4: no high bit → q = 3
    assert(xs(255) == 31.5f)
  }

  test("Q2_K: hand-pinned block (nibble scale+min, 2-bit planes)") {
    // scales all 0x53 (sc 3, m 5) except group 5 = 0x27 (sc 7,
    // m 2); qs all 0xE4 → q = (e>>5)&3; d = 1.5, dmin = 0.5
    val scales = Array.fill[Byte](16)(0x53.toByte)
    scales(5) = 0x27
    val (dl, dh) = halfBytes(1.5f)
    val (ml, mh) = halfBytes(0.5f)
    val block = scales ++ Array.fill[Byte](64)(0xE4.toByte) ++
      Array[Byte](dl, dh, ml, mh)
    assert(block.length == 84)
    val xs = dequantizeQ2_K(block)
    assert(xs(0) == -2.5f)   // 1.5*3*0 - 0.5*5
    assert(xs(32) == 2f)     // 4.5*1 - 2.5
    assert(xs(80) == 20f)    // 1.5*7*2 - 0.5*2 (group 5)
    assert(xs(96) == 11f)    // 4.5*3 - 2.5
    assert(xs(128) == -2.5f) // second 128-run: shift restarts
    assert(xs(255) == 11f)
  }

  test("Q3_K: hand-pinned block (hmask polarity, 6-bit scales)") {
    // hmask 0x0F → elements 0..127 keep the +0 form, 128..255
    // subtract 4; qs 0xE4 → q2 = (e>>5)&3; scales all 34 (→ 2)
    // except scales[2] = 63 (→ 31); d = 0.5
    val sc12 = Array.fill[Byte](8)(0x22.toByte) ++
      Array.fill[Byte](4)(0xAA.toByte)
    sc12(2) = 0x2F; sc12(10) = 0xAB.toByte
    val (dl, dh) = halfBytes(0.5f)
    val block = Array.fill[Byte](32)(0x0F.toByte) ++
      Array.fill[Byte](64)(0xE4.toByte) ++ sc12 ++ Array[Byte](dl, dh)
    assert(block.length == 110)
    val xs = dequantizeQ3_K(block)
    assert(xs(0) == 0f)     // v = 0
    assert(xs(32) == 15.5f) // 0.5*31*1 (the 6-bit high-2 path)
    assert(xs(64) == 2f)    // 0.5*2*2
    assert(xs(96) == 3f)
    assert(xs(128) == -4f)  // hbit clear → q2=0 becomes -4
    assert(xs(160) == -3f)
    assert(xs(255) == -1f)
  }

  test("K-quants: encode→decode stays within analytic bounds") {
    val rnd = new scala.util.Random(53)
    val xs = Array.fill(512)((rnd.nextFloat() - 0.5f) * 24f)
    checkKQuantBounds("Q2_K", xs, quantizeQ2_K(xs))
    checkKQuantBounds("Q3_K", xs, quantizeQ3_K(xs))
    checkKQuantBounds("Q4_K", xs, quantizeQ4_K(xs))
    checkKQuantBounds("Q5_K", xs, quantizeQ5_K(xs))
    checkKQuantBounds("Q6_K", xs, quantizeQ6_K(xs))
    // skewed data (one huge group per block) stresses the
    // sub-scale rounding and the clamp terms
    val skew = xs.clone()
    (0 until 16).foreach(i => skew(i) = skew(i) * 1000f)
    checkKQuantBounds("Q2_K", skew, quantizeQ2_K(skew))
    checkKQuantBounds("Q3_K", skew, quantizeQ3_K(skew))
    checkKQuantBounds("Q4_K", skew, quantizeQ4_K(skew))
    checkKQuantBounds("Q5_K", skew, quantizeQ5_K(skew))
    checkKQuantBounds("Q6_K", skew, quantizeQ6_K(skew))
    // all-zero blocks: exact zeros back
    val z = new Array[Float](256)
    assert(dequantizeQ2_K(quantizeQ2_K(z)).forall(_ == 0f))
    assert(dequantizeQ3_K(quantizeQ3_K(z)).forall(_ == 0f))
    assert(dequantizeQ4_K(quantizeQ4_K(z)).forall(_ == 0f))
    assert(dequantizeQ5_K(quantizeQ5_K(z)).forall(_ == 0f))
    assert(dequantizeQ6_K(quantizeQ6_K(z)).forall(_ == 0f))
  }

  test("K-quant tensors travel the container; 256-block sizing") {
    val rnd = new scala.util.Random(61)
    val xs = Array.fill(512)((rnd.nextFloat() - 0.5f) * 4f)
    val ts = Seq(
      GTensor("a", Seq(256L, 2L), "Q2_K", quantizeQ2_K(xs)),
      GTensor("b", Seq(512L), "Q3_K", quantizeQ3_K(xs)),
      GTensor("c", Seq(512L), "Q4_K", quantizeQ4_K(xs)),
      GTensor("d", Seq(512L), "Q5_K", quantizeQ5_K(xs)),
      GTensor("e", Seq(512L), "Q6_K", quantizeQ6_K(xs)))
    val (_, back) = parse(build(Seq.empty, ts)).get
    assert(back.map(_.tpe) ==
      Seq("Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K"))
    assert(back.map(_.data.length) == Seq(168, 220, 288, 352, 420))
    assert(dequantizeQ6_K(back(4).data)
      .sameElements(dequantizeQ6_K(ts(4).data)))
    // K-quant element counts must be multiples of 256
    Seq("Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K").foreach { t =>
      assert(byteSize(t, 288).isEmpty)
      assert(byteSize(t, 256).isDefined)
    }
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
