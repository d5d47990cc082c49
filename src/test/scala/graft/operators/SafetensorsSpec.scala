package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** safetensors pins: the spec document's own byte layout (8-byte LE
  * header length + JSON + flat buffer), round trips across every
  * dtype, half/bfloat16 lane arithmetic (subnormals, infinities,
  * NaN, round-to-nearest-even), canonical-form enforcement (holes /
  * overlap / trailing bytes reject), offset and size validation,
  * metadata, 0-d and 0-element tensors, and mutation fuzz. */
class SafetensorsSpec extends AnyFunSuite {

  import Safetensors._

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray

  private def f32s(xs: Float*): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(xs.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    xs.foreach(b.putFloat); b.array()
  }

  test("hand-pinned layout: one F32 [2] tensor, no metadata") {
    val t = Tensor("w", "F32", Seq(2), f32s(1.5f, -2.0f))
    val bytes = build(Seq(t))
    // header length is LE u64 at offset 0; header is JSON padded to 8
    val hlen = (0 until 8).map(i =>
      (bytes(i).toLong & 0xff) << (8 * i)).sum
    assert(hlen % 8 == 0)
    val json = new String(bytes, 8, hlen.toInt, "UTF-8")
    assert(json.trim ==
      """{"w":{"dtype":"F32","shape":[2],"data_offsets":[0,8]}}""")
    assert(bytes.length == 8 + hlen + 8)
    val (md, ts) = parse(bytes).get
    assert(md.isEmpty && ts.length == 1)
    assert(ts.head.name == "w" && ts.head.shape == Seq(2))
    assert(f32At(ts.head, 0) == 1.5f && f32At(ts.head, 1) == -2.0f)
  }

  test("every dtype round-trips with its exact itemsize") {
    val rnd = new scala.util.Random(7)
    ItemSize.foreach { case (dt, isz) =>
      val n = 5
      val data = Array.fill(n * isz)(rnd.nextInt().toByte)
      val t = Tensor(s"t_$dt", dt, Seq(n.toLong), data)
      val (_, ts) = parse(build(Seq(t))).get
      assert(ts.head.dtype == dt && ts.head.data.sameElements(data))
    }
  }

  test("multi-tensor file: insertion order, contiguous offsets, metadata") {
    val a = Tensor("emb", "F32", Seq(3, 2), f32s(1, 2, 3, 4, 5, 6))
    val b = Tensor("ids", "I64", Seq(3),
      le(10, 8) ++ le(20, 8) ++ le(30, 8))
    val bytes = build(Seq(a, b), Map("format" -> "graft", "v" -> "1"))
    val (md, ts) = parse(bytes).get
    assert(md == Map("format" -> "graft", "v" -> "1"))
    assert(ts.map(_.name) == Seq("emb", "ids"))
    assert(i64At(ts(1), 2) == 30L)
    assert(ts(0).elems == 6)
  }

  test("0-d scalar and 0-element tensors") {
    val s = Tensor("s", "F64", Seq(),
      java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putDouble(3.25).array())
    val z = Tensor("z", "I32", Seq(0, 4), Array.emptyByteArray)
    val (_, ts) = parse(build(Seq(s, z))).get
    assert(ts.map(_.name).toSet == Set("s", "z"))
    assert(f64At(ts.find(_.name == "s").get, 0) == 3.25)
    assert(ts.find(_.name == "z").get.elems == 0)
  }

  test("F16 lane arithmetic: exact conversions both ways") {
    // classic binary16 values
    assert(halfToFloat(0x3c00) == 1.0f)
    assert(halfToFloat(0xc000) == -2.0f)
    assert(halfToFloat(0x7bff) == 65504.0f)  // max finite
    assert(halfToFloat(0x0001) == math.pow(2, -24).toFloat) // min subnormal
    assert(halfToFloat(0x0000) == 0.0f)
    assert(halfToFloat(0x8000) == -0.0f &&
      1 / halfToFloat(0x8000) < 0)
    assert(halfToFloat(0x7c00).isPosInfinity)
    assert(halfToFloat(0xfc00).isNegInfinity)
    assert(halfToFloat(0x7e00).isNaN)
    // round trip every half bit pattern through float and back
    var h = 0
    while (h < 0x10000) {
      val f = halfToFloat(h)
      if (!f.isNaN) {
        assert((floatToHalf(f) & 0xffff) == h, f"pattern $h%04x")
      }
      h += 1
    }
    // round-to-nearest-even on a tie: 1.0 + 2^-11 rounds to 1.0
    assert((floatToHalf(1.0f + math.pow(2, -11).toFloat) & 0xffff)
      == 0x3c00)
    // and 1.0 + 3·2^-11 rounds UP to the even 0x3c02
    assert((floatToHalf(1.0f + 3 * math.pow(2, -11).toFloat) & 0xffff)
      == 0x3c02)
  }

  test("BF16 is the top half of binary32") {
    val t = Tensor("b", "BF16", Seq(2),
      Array(0x80, 0x3f, 0x49, 0xc0).map(_.toByte)) // 1.0f, -3.140625f
    assert(bf16At(t, 0) == 1.0f)
    assert(bf16At(t, 1) == -3.140625f)
  }

  test("F8 E4M3(FN)/E5M2: exhaustive decode vs the analytic form") {
    // independent formula: sign · (e==0 ? f/2^m · 2^(1-bias)
    //   : (1+f/2^m) · 2^(e-bias)) — computed here in Double
    def ref(b: Int, ebits: Int, mbits: Int, bias: Int): Double = {
      val sign = if ((b & 0x80) != 0) -1.0 else 1.0
      val e = (b >>> mbits) & ((1 << ebits) - 1)
      val f = b & ((1 << mbits) - 1)
      if (e == 0) sign * f / (1 << mbits).toDouble *
        math.pow(2, 1 - bias)
      else sign * (1.0 + f / (1 << mbits).toDouble) *
        math.pow(2, e - bias)
    }
    (0 until 256).foreach { b =>
      // E4M3-FN: only S.1111.111 is NaN, everything else a number
      val x = f8e4m3ToFloat(b)
      if ((b & 0x7f) == 0x7f) assert(x.isNaN, f"e4m3 $b%02x")
      else {
        assert(x.toDouble == ref(b, 4, 3, 7), f"e4m3 $b%02x")
        // encode(decode) is the identity on every non-NaN pattern
        // (−0 comes back as −0)
        assert((floatToF8E4M3(x) & 0xff) == b, f"e4m3 rt $b%02x")
      }
      // E5M2: exp 31 → inf (f=0) / NaN
      val y = f8e5m2ToFloat(b)
      if ((b & 0x7c) == 0x7c && (b & 0x03) != 0)
        assert(y.isNaN, f"e5m2 $b%02x")
      else if ((b & 0x7f) == 0x7c)
        assert(y.isInfinite, f"e5m2 $b%02x")
      else {
        assert(y.toDouble == ref(b, 5, 2, 15), f"e5m2 $b%02x")
        assert((floatToF8E5M2(y) & 0xff) == b, f"e5m2 rt $b%02x")
      }
    }
    (0 until 256).foreach { b =>
      // FNUZ pair (ONNX 18/20): NaN ONLY at 0x80, no inf, no −0,
      // bias one more than the IEEE-ish pair
      val z3 = f8e4m3fnuzToFloat(b)
      if (b == 0x80) assert(z3.isNaN, f"e4m3fnuz $b%02x")
      else {
        assert(z3.toDouble == ref(b, 4, 3, 8), f"e4m3fnuz $b%02x")
        assert((floatToF8E4M3Fnuz(z3) & 0xff) == b,
          f"e4m3fnuz rt $b%02x")
      }
      val z5 = f8e5m2fnuzToFloat(b)
      if (b == 0x80) assert(z5.isNaN, f"e5m2fnuz $b%02x")
      else {
        assert(z5.toDouble == ref(b, 5, 2, 16), f"e5m2fnuz $b%02x")
        assert((floatToF8E5M2Fnuz(z5) & 0xff) == b,
          f"e5m2fnuz rt $b%02x")
      }
    }
    // FNUZ landmarks + conventions: 1.0 at 0x40, saturating
    // overflow (no inf to overflow into), NaN → 0x80, −0 folds to +0
    assert(f8e4m3fnuzToFloat(0x40) == 1f)
    assert(f8e4m3fnuzToFloat(0x7f) == 240f)    // max finite
    assert(f8e4m3fnuzToFloat(0x01) == math.pow(2, -10).toFloat)
    assert(f8e5m2fnuzToFloat(0x40) == 1f)
    assert(f8e5m2fnuzToFloat(0x7f) == 57344f)
    assert(f8e5m2fnuzToFloat(0x01) == math.pow(2, -17).toFloat)
    assert((floatToF8E4M3Fnuz(1e10f) & 0xff) == 0x7f)
    assert((floatToF8E4M3Fnuz(-1e10f) & 0xff) == 0xff)
    assert((floatToF8E5M2Fnuz(Float.PositiveInfinity) & 0xff)
      == 0x7f)
    assert(floatToF8E4M3Fnuz(Float.NaN) == 0x80.toByte)
    assert(floatToF8E5M2Fnuz(Float.NaN) == 0x80.toByte)
    assert(floatToF8E4M3Fnuz(-0f) == 0x00.toByte)
    assert(floatToF8E5M2Fnuz(-0f) == 0x00.toByte)
    // a negative value rounding to zero must come back +0, never
    // 0x80 (which would be NaN)
    assert(floatToF8E4M3Fnuz(-1e-20f) == 0x00.toByte)
    // landmark values
    assert(f8e4m3ToFloat(0x38) == 1f)
    assert(f8e4m3ToFloat(0x7e) == 448f)        // max finite
    assert(f8e4m3ToFloat(0x01) == math.pow(2, -9).toFloat)
    assert(f8e5m2ToFloat(0x3c) == 1f)
    assert(f8e5m2ToFloat(0x7b) == 57344f)      // max finite
    assert(f8e5m2ToFloat(0x01) == math.pow(2, -16).toFloat)
    // rounding: ties to even, saturation semantics
    assert((floatToF8E4M3(449f) & 0xff) == 0x7e)  // FN saturates
    assert((floatToF8E4M3(1e10f) & 0xff) == 0x7e)
    assert((floatToF8E5M2(1e10f) & 0xff) == 0x7c) // E5M2 overflows
    assert(floatToF8E4M3(Float.NaN) == 0x7f.toByte)
    // halfway between 1.0 (0x38) and 1.125 (0x39): ties to even
    assert((floatToF8E4M3(1.0625f) & 0xff) == 0x38)
    // lanes through a built file
    val t = Tensor("q", "F8_E4M3", Seq(2),
      Array(0x38, 0xc0).map(_.toByte)) // 1.0, -2.0
    val (_, ts) = parse(build(Seq(t))).get
    assert(f8e4m3At(ts.head, 0) == 1f && f8e4m3At(ts.head, 1) == -2f)
    val t2 = Tensor("r", "F8_E5M2", Seq(1), Array(0xc0.toByte))
    assert(f8e5m2At(parse(build(Seq(t2))).get._2.head, 0) == -2f)
  }

  test("non-canonical and malformed headers reject") {
    val t = Tensor("w", "F32", Seq(2), f32s(1, 2))
    val ok = build(Seq(t))
    def withHeader(json: String, buf: Array[Byte]): Array[Byte] = {
      val h = json.getBytes("UTF-8")
      le(h.length.toLong, 8) ++ h ++ buf
    }
    // hole before the first tensor
    assert(parse(withHeader(
      """{"w":{"dtype":"F32","shape":[2],"data_offsets":[4,12]}}""",
      new Array[Byte](12))).isEmpty)
    // overlap between tensors
    assert(parse(withHeader(
      """{"a":{"dtype":"F32","shape":[2],"data_offsets":[0,8]},""" +
        """"b":{"dtype":"F32","shape":[2],"data_offsets":[4,12]}}""",
      new Array[Byte](12))).isEmpty)
    // trailing bytes after the last tensor
    assert(parse(withHeader(
      """{"w":{"dtype":"F32","shape":[2],"data_offsets":[0,8]}}""",
      new Array[Byte](9))).isEmpty)
    // size mismatch vs shape·itemsize
    assert(parse(withHeader(
      """{"w":{"dtype":"F32","shape":[3],"data_offsets":[0,8]}}""",
      new Array[Byte](8))).isEmpty)
    // unknown dtype
    assert(parse(withHeader(
      """{"w":{"dtype":"Q4","shape":[2],"data_offsets":[0,8]}}""",
      new Array[Byte](8))).isEmpty)
    // negative dim
    assert(parse(withHeader(
      """{"w":{"dtype":"F32","shape":[-2],"data_offsets":[0,8]}}""",
      new Array[Byte](8))).isEmpty)
    // end beyond buffer
    assert(parse(withHeader(
      """{"w":{"dtype":"F32","shape":[2],"data_offsets":[0,8]}}""",
      new Array[Byte](4))).isEmpty)
    // begin > end
    assert(parse(withHeader(
      """{"w":{"dtype":"F32","shape":[0],"data_offsets":[8,0]}}""",
      new Array[Byte](8))).isEmpty)
    // header length beyond input
    val broken = ok.clone()
    broken(0) = (broken(0) + 64).toByte
    assert(parse(broken).isEmpty)
    // non-string metadata value
    assert(parse(withHeader(
      """{"__metadata__":{"k":1},""" +
        """"w":{"dtype":"F32","shape":[2],"data_offsets":[0,8]}}""",
      new Array[Byte](8))).isEmpty)
    // truncated / garbage inputs never throw
    assert(parse(Array.emptyByteArray).isEmpty)
    assert(parse(ok.take(7)).isEmpty)
  }

  test("mutation fuzz: single-byte corruptions never throw") {
    val t1 = Tensor("emb", "F16", Seq(4),
      Array.tabulate(8)(i => (i * 37).toByte))
    val t2 = Tensor("ids", "I64", Seq(1), le(42, 8))
    val base = build(Seq(t1, t2), Map("k" -> "v"))
    val rnd = new scala.util.Random(11)
    (0 until 400).foreach { _ =>
      val m = base.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      parse(m) // must not throw; header mutations mostly reject
    }
    (0 until 100).foreach { _ =>
      val m = Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      parse(m)
    }
  }
}
