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
