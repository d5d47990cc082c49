package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ONNX pins: hand-pinned ModelProto wire layout, graph/node/
  * initializer round trips through BOTH tensor storage paths
  * (raw_data and the typed packed fields), per-element vs packed
  * repeated acceptance, F16/BF16 lanes, element-count/truncation/
  * unknown-type/external-data rejections, unknown-field skipping,
  * and fuzz. */
class OnnxSpec extends AnyFunSuite {

  import Onnx._

  private def f32Bytes(xs: Float*): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(xs.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    xs.foreach(b.putFloat); b.array()
  }

  private def model(rawData: Boolean): OModel = OModel(
    irVersion = 8L, producer = "graft",
    opsets = Seq(("", 17L), ("com.custom", 2L)),
    graphName = "g",
    nodes = Seq(
      ONode("mm", "MatMul", Seq("x", "w"), Seq("h")),
      ONode("act", "Relu", Seq("h"), Seq("y"))),
    initializers = Seq(
      OTensor("w", Seq(2L, 3L), 1, f32Bytes(1f, 2f, 3f, 4f, 5f, 6f)),
      OTensor("ids", Seq(3L), 7, {
        val b = java.nio.ByteBuffer.allocate(24)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        Seq(-1L, 0L, Long.MaxValue).foreach(b.putLong); b.array()
      }),
      OTensor("lab", Seq(2L), 6, {
        val b = java.nio.ByteBuffer.allocate(8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        Seq(Int.MinValue, 7).foreach(b.putInt); b.array()
      }),
      OTensor("d", Seq(2L), 11, {
        val b = java.nio.ByteBuffer.allocate(16)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        Seq(0.5, -2.25).foreach(b.putDouble); b.array()
      })),
    inputs = Seq("x"), outputs = Seq("y"))

  test("hand-pinned header: ir_version tag, producer, graph tag") {
    val bytes = buildModel(model(rawData = true))
    // field 1 varint: tag 0x08, value 8
    assert(bytes(0) == 0x08 && bytes(1) == 8)
    // field 2 LEN: tag 0x12, len 5, "graft"
    assert(bytes(2) == 0x12 && bytes(3) == 5)
    assert(new String(bytes, 4, 5, "UTF-8") == "graft")
    // field 7 LEN (graph) follows: tag 0x3a
    assert((bytes(9) & 0xff) == 0x3a)
  }

  test("round trip through BOTH tensor storage paths") {
    Seq(true, false).foreach { raw =>
      val m = model(raw)
      val got = parseModel(buildModel(m, rawData = raw)).getOrElse(
        fail(s"rejected own build (rawData=$raw)"))
      assert(got.irVersion == 8L && got.producer == "graft")
      assert(got.opsets == Seq(("", 17L), ("com.custom", 2L)))
      assert(got.graphName == "g")
      assert(got.nodes == m.nodes)
      assert(got.inputs == Seq("x") && got.outputs == Seq("y"))
      val byName = got.initializers.map(t => t.name -> t).toMap
      assert(byName.keySet == Set("w", "ids", "lab", "d"))
      assert(byName("w").dims == Seq(2L, 3L))
      assert(f32At(byName("w"), 5) == 6f)
      assert(i64At(byName("ids"), 0) == -1L &&
        i64At(byName("ids"), 2) == Long.MaxValue)
      assert(i32At(byName("lab"), 0) == Int.MinValue)
      assert(f64At(byName("d"), 1) == -2.25)
    }
  }

  test("F16/BF16 initializers decode through the shared half-float") {
    val hb = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hb.putShort(Safetensors.floatToHalf(1.5f))
    hb.putShort(Safetensors.floatToHalf(-0.25f))
    val bb = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(1.0f, -2.0f).foreach(x => bb.putShort(
      (java.lang.Float.floatToIntBits(x) >>> 16).toShort))
    val m = OModel(8L, "g", Seq(("", 17L)), "g",
      Seq.empty,
      Seq(OTensor("h", Seq(2L), 10, hb.array()),
        OTensor("b", Seq(2L), 16, bb.array())),
      Seq.empty, Seq.empty)
    val got = parseModel(buildModel(m)).get
    assert(f16At(got.initializers(0), 0) == 1.5f)
    assert(f16At(got.initializers(0), 1) == -0.25f)
    assert(bf16At(got.initializers(1), 1) == -2.0f)
  }

  test("F8 initializers decode — FN/E5M2 and both FNUZ variants") {
    // E4M3-FN 0x38 = 1.0, 0xc0 = -2.0; E5M2 0x3c = 1.0, 0x44 = 4.0
    val m = OModel(8L, "g", Seq(("", 17L)), "g",
      Seq.empty,
      Seq(OTensor("a", Seq(2L), 17,
          Array(0x38, 0xc0).map(_.toByte)),
        OTensor("b", Seq(2L), 19,
          Array(0x3c, 0x44).map(_.toByte)),
        // FNUZ bias is ONE MORE than the IEEE-ish pair: 1.0 sits at
        // 0x40 (not 0x38/0x3c) in both, and 0x80 is NaN, not −0
        OTensor("c", Seq(4L), 18,
          Array(0x40, 0xc8, 0x7f, 0x80).map(_.toByte)),
        OTensor("d", Seq(3L), 20,
          Array(0x40, 0x48, 0x7f).map(_.toByte))),
      Seq.empty, Seq.empty)
    val got = parseModel(buildModel(m)).get
    assert(f8e4m3At(got.initializers(0), 0) == 1f)
    assert(f8e4m3At(got.initializers(0), 1) == -2f)
    assert(f8e5m2At(got.initializers(1), 0) == 1f)
    assert(f8e5m2At(got.initializers(1), 1) == 4f)
    assert(f8e4m3fnuzAt(got.initializers(2), 0) == 1f)
    assert(f8e4m3fnuzAt(got.initializers(2), 1) == -2f)
    assert(f8e4m3fnuzAt(got.initializers(2), 2) == 240f) // max
    assert(f8e4m3fnuzAt(got.initializers(2), 3).isNaN)
    assert(f8e5m2fnuzAt(got.initializers(3), 0) == 1f)
    assert(f8e5m2fnuzAt(got.initializers(3), 1) == 4f)
    assert(f8e5m2fnuzAt(got.initializers(3), 2) == 57344f)
    // an actually-unknown element type still rejects (FLOAT4E2M1=23)
    val bytes = buildModel(OModel(8L, "g", Seq.empty, "g",
      Seq.empty,
      Seq(OTensor("a", Seq(1L), 17, Array(0x38.toByte))),
      Seq.empty, Seq.empty))
    var i = 0
    var sawReject = false
    while (!sawReject && i < bytes.length) {
      if (bytes(i) == 17) {
        val c = bytes.clone(); c(i) = 23
        if (parseModel(c).isEmpty) sawReject = true
      }
      i += 1
    }
    assert(sawReject)
  }

  test("external-data tensors resolve through the caller; no " +
      "resolver rejects") {
    // two tensors share one side file at different offsets — the
    // layout ONNX's own externalizer produces for >2 GiB models
    val aBytes = f32Bytes(1f, 2f, 3f, 4f)
    val bBytes = {
      val bb = java.nio.ByteBuffer.allocate(16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      Seq(10L, -20L).foreach(bb.putLong); bb.array()
    }
    val side = aBytes ++ bBytes
    val m = OModel(8L, "g", Seq(("", 17L)), "g",
      Seq.empty,
      Seq(OTensor("a", Seq(4L), 1, aBytes),
        OTensor("b", Seq(2L), 7, bBytes)),
      Seq.empty, Seq.empty)
    val bytes = buildModel(m, externalize = Map(
      "a" -> (("weights.bin", 0L)),
      "b" -> (("weights.bin", 16L))))
    // without a resolver: honest rejection
    assert(parseModel(bytes).isEmpty)
    // with one: lanes decode from the side file
    val resolver = (loc: String) =>
      if (loc == "weights.bin") Some(side) else None
    val got = parseModel(bytes, resolver).get
    assert(f32At(got.initializers(0), 3) == 4f)
    assert(i64At(got.initializers(1), 1) == -20L)
    // a short side file rejects (offset+length must fit; the
    // declared length must equal dims·itemsize — no zero-fill)
    assert(parseModel(bytes,
      _ => Some(side.dropRight(1))).isEmpty)
    // unknown location rejects
    assert(parseModel(bytes, _ => None).isEmpty)
  }

  test("malformed models reject; unknown fields skip") {
    val ok = buildModel(model(rawData = true))
    assert(parseModel(ok).isDefined)
    assert(parseModel(Array.emptyByteArray).isEmpty) // no graph
    assert(parseModel(ok.dropRight(1)).isEmpty)      // truncated
    // element count vs dims mismatch rejects
    assertThrows[IllegalArgumentException](buildModel(OModel(
      8L, "g", Seq.empty, "g", Seq.empty,
      Seq(OTensor("w", Seq(3L), 1, f32Bytes(1f, 2f))),
      Seq.empty, Seq.empty)))
    // unknown tensor data_type rejects at parse: patch type 1 -> 99
    val one = buildModel(OModel(8L, "g", Seq.empty, "g", Seq.empty,
      Seq(OTensor("w", Seq(1L), 1, f32Bytes(9f))),
      Seq.empty, Seq.empty))
    var patched: Array[Byte] = null
    var i = 0
    while (patched == null && i < one.length - 1) {
      if (one(i) == 0x10 && one(i + 1) == 1) { // field 2 varint = 1
        val c = one.clone(); c(i + 1) = 99
        if (parseModel(c).isEmpty) patched = c
      }
      i += 1
    }
    assert(patched != null)
    // external data rejects: append data_location=1 to the tensor
    // (simplest: build by hand — field 13 varint 1 inside tensor)
    val ext = {
      val t = new java.io.ByteArrayOutputStream()
      // dims [1], type 1, name w, raw 4 bytes, data_location 1
      t.write(Array[Byte](0x08, 1, 0x10, 1, 0x42, 1, 'w',
        0x4a, 4, 0, 0, 0, 0, 0x68, 1))
      val g = new java.io.ByteArrayOutputStream()
      g.write(0x2a); g.write(t.size()); t.writeTo(g)
      val m = new java.io.ByteArrayOutputStream()
      m.write(Array[Byte](0x08, 8))
      m.write(0x3a); m.write(g.size()); g.writeTo(m)
      m.toByteArray
    }
    assert(parseModel(ext).isEmpty)
    // unknown top-level fields skip cleanly: prepend a field-99
    // varint (multi-byte tag)
    val unknown = {
      val out = new java.io.ByteArrayOutputStream()
      var tag = (99L << 3) | 0
      while ((tag & ~0x7fL) != 0) {
        out.write(((tag & 0x7f) | 0x80).toInt); tag >>>= 7 }
      out.write(tag.toInt)
      out.write(7) // the varint value
      out.write(ok)
      out.toByteArray
    }
    assert(parseModel(unknown).isDefined)
  }

  test("fuzz: mutations never throw") {
    val base = buildModel(model(rawData = false))
    val rnd = new scala.util.Random(53)
    (0 until 500).foreach { _ =>
      val m = base.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      parseModel(m)
    }
    (0 until 300).foreach { _ =>
      parseModel(Array.fill(rnd.nextInt(80))(rnd.nextInt().toByte))
    }
  }
}
