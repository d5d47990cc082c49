package graft.operators

/** ONNX model files (the public onnx.proto3 schema) — the
  * interchange format model weights and preprocessing graphs ship
  * in; a data engine meets it when a pipeline needs a model's
  * embedding matrix, vocabulary projection or graph structure
  * without an inference runtime. Built on the SAME wire-format
  * machinery as [[Protobuf]]'s tf.train family (varints, tags,
  * length-delimited sub-cursors — field numbers from the public
  * .proto), both directions:
  *
  *  - [[parseModel]]: ModelProto (ir_version 1, producer_name 2,
  *    graph 7, opset_import 8) → GraphProto (node 1, name 2,
  *    initializer 5, input 11, output 12) → NodeProto (input 1,
  *    output 2, name 3, op_type 4) and TensorProto (dims 1,
  *    data_type 2, float_data 4, int32_data 5, int64_data 7,
  *    name 8, raw_data 9, double_data 10). Typed repeated fields
  *    accept BOTH packed and per-element encodings (proto3 rule);
  *    tensor payloads normalize to little-endian raw bytes
  *    whichever way they were stored, and element counts must
  *    match `dims` exactly — a truncated weight blob rejects, it
  *    does not zero-fill. Unknown fields skip at every level
  *    (schema evolution); groups reject.
  *  - [[buildModel]] emits the same layout (raw_data or typed-data
  *    storage per tensor, so both read paths stay live in tests
  *    and the gate).
  *
  * Supported tensor element types: FLOAT(1), UINT8(2), INT8(3),
  * INT32(6), INT64(7), BOOL(9), FLOAT16(10), DOUBLE(11),
  * BFLOAT16(16), FLOAT8E4M3FN(17), FLOAT8E5M2(19) — F16/BF16
  * through the shared closed-form half-float arithmetic and the F8
  * pair through [[Safetensors.f8e4m3ToFloat]]/[[Safetensors
  * .f8e5m2ToFloat]] (closed form, no table). Anything else —
  * including the FNUZ float8 variants (18/20), which real
  * exporters do not emit — rejects honestly.
  * External-data tensors (data_location = 1) reject — their bytes
  * live outside the file. Validation: OnnxSpec (hand-pinned wire
  * layouts, both storage paths, packed/per-element acceptance,
  * truncation/unknown-type rejections, fuzz) + the `onnx_parse`
  * gate query. */
object Onnx {

  import Protobuf.{Cursor, writeVarint, writeTag, writeLen}

  /** data_type → bytes per element (the supported set). */
  val ItemSize: Map[Int, Int] = Map(
    1 -> 4, 2 -> 1, 3 -> 1, 6 -> 4, 7 -> 8, 9 -> 1, 10 -> 2,
    11 -> 8, 16 -> 2, 17 -> 1, 19 -> 1)

  /** One initializer: dims, ONNX data_type id, and the payload
    * normalized to little-endian raw bytes. */
  final case class OTensor(name: String, dims: Seq[Long],
      dataType: Int, data: Array[Byte]) {
    def elems: Long = dims.foldLeft(1L)(_ * _)
  }

  final case class ONode(name: String, opType: String,
      inputs: Seq[String], outputs: Seq[String])

  final case class OModel(irVersion: Long, producer: String,
      opsets: Seq[(String, Long)], graphName: String,
      nodes: Seq[ONode], initializers: Seq[OTensor],
      inputs: Seq[String], outputs: Seq[String])

  private final val MaxElems = Int.MaxValue.toLong
  private final val MaxItems = 1 << 24

  // ---------------------------------------------------------------
  // Build
  // ---------------------------------------------------------------

  private def strField(out: java.io.ByteArrayOutputStream,
      field: Int, s: String): Unit =
    writeLen(out, field, s.getBytes("UTF-8"))

  /** `rawData = false` stores FLOAT/INT32/INT64/DOUBLE tensors in
    * their typed packed fields instead of raw_data (both are legal
    * on the wire; readers must take either). */
  def buildTensor(t: OTensor, rawData: Boolean = true)
      : Array[Byte] = {
    val isz = ItemSize.getOrElse(t.dataType,
      sys.error(s"tensor ${t.name}: data_type ${t.dataType}"))
    require(t.data.length.toLong == t.elems * isz,
      s"tensor ${t.name}: ${t.data.length} bytes for ${t.elems}")
    val out = new java.io.ByteArrayOutputStream(t.data.length + 64)
    t.dims.foreach { d => writeTag(out, 1, 0); writeVarint(out, d) }
    writeTag(out, 2, 0); writeVarint(out, t.dataType.toLong)
    strField(out, 8, t.name)
    val bb = java.nio.ByteBuffer.wrap(t.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (rawData || !Set(1, 5, 6, 7, 11).contains(t.dataType)) {
      writeLen(out, 9, t.data)
    } else t.dataType match {
      case 1 => // float_data, packed fixed32
        val body = new java.io.ByteArrayOutputStream(t.data.length)
        (0 until t.elems.toInt).foreach { i =>
          val bits = bb.getInt(i * 4)
          body.write(bits & 0xff); body.write((bits >> 8) & 0xff)
          body.write((bits >> 16) & 0xff)
          body.write((bits >> 24) & 0xff)
        }
        writeLen(out, 4, body.toByteArray)
      case 6 => // int32_data, packed varints
        val body = new java.io.ByteArrayOutputStream()
        (0 until t.elems.toInt).foreach(i =>
          writeVarint(body, bb.getInt(i * 4).toLong))
        writeLen(out, 5, body.toByteArray)
      case 7 => // int64_data, packed varints
        val body = new java.io.ByteArrayOutputStream()
        (0 until t.elems.toInt).foreach(i =>
          writeVarint(body, bb.getLong(i * 8)))
        writeLen(out, 7, body.toByteArray)
      case 11 => // double_data, packed fixed64
        val body = new java.io.ByteArrayOutputStream(t.data.length)
        (0 until t.elems.toInt).foreach { i =>
          val bits = bb.getLong(i * 8)
          var j = 0
          while (j < 8) {
            body.write(((bits >>> (8 * j)) & 0xff).toInt); j += 1 }
        }
        writeLen(out, 10, body.toByteArray)
      case _ => writeLen(out, 9, t.data)
    }
    out.toByteArray
  }

  private def buildNode(n: ONode): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    n.inputs.foreach(strField(out, 1, _))
    n.outputs.foreach(strField(out, 2, _))
    strField(out, 3, n.name)
    strField(out, 4, n.opType)
    out.toByteArray
  }

  /** ValueInfoProto carrying just a name (field 1). */
  private def buildValueInfo(name: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(32)
    strField(out, 1, name)
    out.toByteArray
  }

  def buildModel(m: OModel, rawData: Boolean = true): Array[Byte] = {
    val g = new java.io.ByteArrayOutputStream(1024)
    m.nodes.foreach(n => writeLen(g, 1, buildNode(n)))
    strField(g, 2, m.graphName)
    m.initializers.foreach(t =>
      writeLen(g, 5, buildTensor(t, rawData)))
    m.inputs.foreach(n => writeLen(g, 11, buildValueInfo(n)))
    m.outputs.foreach(n => writeLen(g, 12, buildValueInfo(n)))
    val out = new java.io.ByteArrayOutputStream(g.size() + 128)
    writeTag(out, 1, 0); writeVarint(out, m.irVersion)
    strField(out, 2, m.producer)
    writeLen(out, 7, g.toByteArray)
    m.opsets.foreach { case (domain, version) =>
      val op = new java.io.ByteArrayOutputStream(16)
      if (domain.nonEmpty) strField(op, 1, domain)
      writeTag(op, 2, 0); writeVarint(op, version)
      writeLen(out, 8, op.toByteArray)
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Parse
  // ---------------------------------------------------------------

  private def str(c: Cursor): Option[String] = {
    val s = c.lenSlice()
    if (!c.ok) return None
    val b = java.util.Arrays.copyOfRange(s.b, s.p, s.end)
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    try Some(dec.decode(java.nio.ByteBuffer.wrap(b)).toString)
    catch { case _: java.nio.charset.CharacterCodingException =>
      c.fail(); None }
  }

  /** Repeated numeric field: accept packed (wire 2) and
    * per-element; `read` consumes ONE element from the cursor. */
  private def repeated[T](c: Cursor, wire: Int,
      into: scala.collection.mutable.ArrayBuffer[T],
      read: Cursor => T): Unit = {
    if (wire == 2) {
      val s = c.lenSlice()
      while (s.hasMore && into.length <= MaxItems) into += read(s)
      if (!s.ok || into.length > MaxItems) c.fail()
    } else into += read(c)
  }

  private def parseTensor(c: Cursor): Option[OTensor] = {
    val dims = scala.collection.mutable.ArrayBuffer[Long]()
    var dataType = 0
    var name = ""
    var raw: Array[Byte] = null
    val floats = scala.collection.mutable.ArrayBuffer[Int]()
    val i32s = scala.collection.mutable.ArrayBuffer[Int]()
    val i64s = scala.collection.mutable.ArrayBuffer[Long]()
    val f64s = scala.collection.mutable.ArrayBuffer[Long]()
    while (c.hasMore) {
      val tag = c.varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      field match {
        case 1 => repeated(c, wire, dims, (x: Cursor) => x.varint())
        case 2 => dataType = c.varint().toInt
        case 4 => repeated(c, wire, floats, (x: Cursor) => x.fixed32())
        case 5 => repeated(c, wire, i32s,
          (x: Cursor) => x.varint().toInt)
        case 7 => repeated(c, wire, i64s, (x: Cursor) => x.varint())
        case 8 => name = str(c).getOrElse(return None)
        case 9 =>
          val s = c.lenSlice()
          if (!c.ok) return None
          raw = java.util.Arrays.copyOfRange(s.b, s.p, s.end)
        case 10 => repeated(c, wire, f64s, (x: Cursor) => x.fixed64())
        case 13 => // data_location: 1 = external → reject
          if (c.varint() != 0L) return None
        case _ => c.skip(wire)
      }
      if (!c.ok) return None
    }
    val isz = ItemSize.getOrElse(dataType, return None)
    if (dims.exists(_ < 0)) return None
    var elems = 1L
    dims.foreach { d =>
      elems *= d
      if (elems > MaxElems) return None
    }
    // normalize whichever storage was used to LE raw bytes
    val data: Array[Byte] =
      if (raw != null) {
        if (floats.nonEmpty || i32s.nonEmpty || i64s.nonEmpty ||
          f64s.nonEmpty) return None // double storage: malformed
        raw
      } else {
        val bb = java.nio.ByteBuffer.allocate((elems * isz).toInt)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        dataType match {
          case 1 =>
            if (floats.length.toLong != elems) return None
            floats.foreach(bb.putInt)
          case 6 =>
            if (i32s.length.toLong != elems) return None
            i32s.foreach(bb.putInt)
          case 7 =>
            if (i64s.length.toLong != elems) return None
            i64s.foreach(bb.putLong)
          case 11 =>
            if (f64s.length.toLong != elems) return None
            f64s.foreach(bb.putLong)
          case _ => return None // typed storage for other types
        }
        bb.array()
      }
    if (data.length.toLong != elems * isz) return None
    Some(OTensor(name, dims.toSeq, dataType, data))
  }

  private def parseNode(c: Cursor): Option[ONode] = {
    val ins = Seq.newBuilder[String]
    val outs = Seq.newBuilder[String]
    var name = ""
    var op = ""
    while (c.hasMore) {
      val tag = c.varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      field match {
        case 1 => ins += str(c).getOrElse(return None)
        case 2 => outs += str(c).getOrElse(return None)
        case 3 => name = str(c).getOrElse(return None)
        case 4 => op = str(c).getOrElse(return None)
        case _ => c.skip(wire)
      }
      if (!c.ok) return None
    }
    Some(ONode(name, op, ins.result(), outs.result()))
  }

  private def valueInfoName(c: Cursor): Option[String] = {
    var name = ""
    while (c.hasMore) {
      val tag = c.varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      if (field == 1) name = str(c).getOrElse(return None)
      else c.skip(wire)
      if (!c.ok) return None
    }
    Some(name)
  }

  def parseModel(bytes: Array[Byte]): Option[OModel] = {
    val c = new Cursor(bytes, 0, bytes.length)
    var ir = 0L
    var producer = ""
    val opsets = Seq.newBuilder[(String, Long)]
    var graphName = ""
    val nodes = Seq.newBuilder[ONode]
    val inits = Seq.newBuilder[OTensor]
    val ins = Seq.newBuilder[String]
    val outs = Seq.newBuilder[String]
    var sawGraph = false
    while (c.hasMore) {
      val tag = c.varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      field match {
        case 1 => ir = c.varint()
        case 2 => producer = str(c).getOrElse(return None)
        case 7 =>
          sawGraph = true
          val g = c.lenSlice()
          if (!c.ok) return None
          while (g.hasMore) {
            val gt = g.varint()
            val gf = (gt >>> 3).toInt
            val gw = (gt & 7).toInt
            gf match {
              case 1 => nodes += parseNode(g.lenSlice())
                .getOrElse(return None)
              case 2 => graphName = str(g).getOrElse(return None)
              case 5 => inits += parseTensor(g.lenSlice())
                .getOrElse(return None)
              case 11 => ins += valueInfoName(g.lenSlice())
                .getOrElse(return None)
              case 12 => outs += valueInfoName(g.lenSlice())
                .getOrElse(return None)
              case _ => g.skip(gw)
            }
            if (!g.ok) return None
          }
        case 8 =>
          val o = c.lenSlice()
          if (!c.ok) return None
          var domain = ""
          var version = 0L
          while (o.hasMore) {
            val ot = o.varint()
            (ot >>> 3).toInt match {
              case 1 => domain = str(o).getOrElse(return None)
              case 2 => version = o.varint()
              case _ => o.skip((ot & 7).toInt)
            }
            if (!o.ok) return None
          }
          opsets += ((domain, version))
        case _ => c.skip(wire)
      }
      if (!c.ok) return None
    }
    if (!c.ok || !sawGraph) return None
    Some(OModel(ir, producer, opsets.result(), graphName,
      nodes.result(), inits.result(), ins.result(), outs.result()))
  }

  // ---------------------------------------------------------------
  // Lane accessors
  // ---------------------------------------------------------------

  private def bb(t: OTensor) = java.nio.ByteBuffer.wrap(t.data)
    .order(java.nio.ByteOrder.LITTLE_ENDIAN)

  def f32At(t: OTensor, i: Int): Float = {
    require(t.dataType == 1); bb(t).getFloat(i * 4)
  }
  def i64At(t: OTensor, i: Int): Long = {
    require(t.dataType == 7); bb(t).getLong(i * 8)
  }
  def i32At(t: OTensor, i: Int): Int = {
    require(t.dataType == 6); bb(t).getInt(i * 4)
  }
  def f64At(t: OTensor, i: Int): Double = {
    require(t.dataType == 11); bb(t).getDouble(i * 8)
  }
  def f16At(t: OTensor, i: Int): Float = {
    require(t.dataType == 10)
    Safetensors.halfToFloat(bb(t).getShort(i * 2) & 0xffff)
  }
  def bf16At(t: OTensor, i: Int): Float = {
    require(t.dataType == 16)
    java.lang.Float.intBitsToFloat(
      (bb(t).getShort(i * 2) & 0xffff) << 16)
  }
  def f8e4m3At(t: OTensor, i: Int): Float = {
    require(t.dataType == 17)
    Safetensors.f8e4m3ToFloat(t.data(i) & 0xff)
  }
  def f8e5m2At(t: OTensor, i: Int): Float = {
    require(t.dataType == 19)
    Safetensors.f8e5m2ToFloat(t.data(i) & 0xff)
  }
}
