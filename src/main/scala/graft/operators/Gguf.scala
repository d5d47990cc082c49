package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** GGUF v3 (the public ggml/llama.cpp format spec, docs/gguf.md) —
  * the single-file model+metadata container the local-inference
  * ecosystem standardized on; a data engine meets it when a corpus
  * pipeline needs a model's tokenizer vocabulary, embedding matrix
  * or projection weights without a Python round trip. Pure-JVM,
  * both directions:
  *
  *  - layout: magic "GGUF", u32 version (3), u64 tensor count, u64
  *    metadata-KV count; then KVs (u64-length strings, u32-typed
  *    values incl. nested-by-one arrays); then tensor infos (name,
  *    u32 n_dims, u64 dims in ggml order — ne[0] is the INNERMOST
  *    axis, the reverse of numpy —, u32 ggml type, u64 offset into
  *    the data section); then padding to `general.alignment`
  *    (default 32) and the tensor data, each tensor's offset
  *    aligned.
  *  - types: all 13 metadata value types; tensor types F32, F16,
  *    BF16, F64, I8/I16/I32/I64 and the CLOSED-FORM block
  *    quantizations — the whole family whose layout is pure
  *    arithmetic, no tabulated constants:
  *      Q8_0 (34 B / 32 elems: f16 scale `d = max|x|/127` + 32
  *        signed bytes `round(x/d)`),
  *      Q4_0 (18 B: f16 `d = signedmax/-8` + 16 nibble bytes, first
  *        half of the block in LOW nibbles, second half in HIGH —
  *        the ggml split layout),
  *      Q4_1 (20 B: f16 `d = (max-min)/15`, f16 `m = min`, 16
  *        nibble bytes, `x = q·d + m`),
  *      Q5_0 (22 B: f16 `d = signedmax/-16`, u32 LE `qh` carrying
  *        each lane's 5th bit, 16 nibble bytes),
  *      Q5_1 (24 B: f16 d, f16 m, u32 qh, 16 nibble bytes),
  *    via [[quantizeQ8_0]]/[[dequantizeQ8_0]] and the
  *    [[quantizeQ4_0]]…[[dequantizeQ5_1]] family on the shared
  *    half-float arithmetic in [[Safetensors]]. The TABLE-DRIVEN
  *    K-quants (Q4_K…) and IQ types reject honestly — their
  *    layouts are defined by hundreds of tabulated constants this
  *    repo's policy excludes.
  *
  * Validation mirrors gguf.py's reader rules: counts and string
  * lengths bounded, metadata value types must be known (arrays
  * nest one level), tensor dims positive with element count ≤
  * 2^31, offsets must be alignment-multiples AND tile the data
  * section in declared order (the canonical writer layout), and
  * the file must end exactly at the last tensor's end. None on any
  * malformation — drop, never invent. Validation is hand-pinned
  * layouts from the spec document, round trips across all types,
  * Q8_0 error-bound checks, and mutation fuzz — GgufSpec. */
object Gguf {

  /** Metadata value — one case per wire type so round trips are
    * byte-exact. */
  sealed trait Gv
  final case class GvU8(v: Int) extends Gv
  final case class GvI8(v: Int) extends Gv
  final case class GvU16(v: Int) extends Gv
  final case class GvI16(v: Int) extends Gv
  final case class GvU32(v: Long) extends Gv
  final case class GvI32(v: Int) extends Gv
  final case class GvF32(v: Float) extends Gv
  final case class GvBool(v: Boolean) extends Gv
  final case class GvStr(v: String) extends Gv
  /** Homogeneous array: `tpe` is the ELEMENT wire type. */
  final case class GvArr(tpe: Int, vs: Seq[Gv]) extends Gv
  /** u64 — raw bits (may exceed Long.MaxValue). */
  final case class GvU64(raw: Long) extends Gv
  final case class GvI64(v: Long) extends Gv
  final case class GvF64(v: Double) extends Gv

  /** Wire type ids (spec enum gguf_metadata_value_type). */
  private def typeOf(v: Gv): Int = v match {
    case _: GvU8 => 0
    case _: GvI8 => 1
    case _: GvU16 => 2
    case _: GvI16 => 3
    case _: GvU32 => 4
    case _: GvI32 => 5
    case _: GvF32 => 6
    case _: GvBool => 7
    case _: GvStr => 8
    case _: GvArr => 9
    case _: GvU64 => 10
    case _: GvI64 => 11
    case _: GvF64 => 12
  }

  /** One tensor: dims in GGML order (ne[0] innermost), type tag,
    * raw data bytes. */
  final case class GTensor(name: String, dims: Seq[Long],
      tpe: String, data: Array[Byte]) {
    def elems: Long = dims.foldLeft(1L)(_ * _)
  }

  /** ggml type id ↔ tag for the supported (non-table-quantized)
    * set; Q8_0 is the one block type (34 bytes / 32 elems). */
  private val TypeIds: Map[String, Int] = Map(
    "F32" -> 0, "F16" -> 1, "Q4_0" -> 2, "Q4_1" -> 3, "Q5_0" -> 6,
    "Q5_1" -> 7, "Q8_0" -> 8, "I8" -> 24, "I16" -> 25,
    "I32" -> 26, "I64" -> 27, "F64" -> 28, "BF16" -> 30)
  private val TypeTags: Map[Int, String] = TypeIds.map(_.swap)

  /** Bytes for `n` elements of tensor type `tag`. */
  def byteSize(tag: String, n: Long): Option[Long] = tag match {
    case "F32" => Some(n * 4)
    case "F16" | "BF16" => Some(n * 2)
    case "F64" | "I64" => Some(n * 8)
    case "I32" => Some(n * 4)
    case "I16" => Some(n * 2)
    case "I8" => Some(n)
    case "Q8_0" => if (n % 32 == 0) Some(n / 32 * 34) else None
    case "Q4_0" => if (n % 32 == 0) Some(n / 32 * 18) else None
    case "Q4_1" => if (n % 32 == 0) Some(n / 32 * 20) else None
    case "Q5_0" => if (n % 32 == 0) Some(n / 32 * 22) else None
    case "Q5_1" => if (n % 32 == 0) Some(n / 32 * 24) else None
    case _ => None
  }

  private final val MaxStr = 1 << 20
  private final val MaxCount = 1 << 20
  private final val MaxElems = Int.MaxValue.toLong

  // ---------------------------------------------------------------
  // Build (canonical: declared order, aligned contiguous offsets)
  // ---------------------------------------------------------------

  def build(metadata: Seq[(String, Gv)], tensors: Seq[GTensor],
      alignment: Int = 32): Array[Byte] = {
    require(alignment > 0 && (alignment & (alignment - 1)) == 0,
      "alignment must be a power of two")
    require(tensors.map(_.name).distinct.length == tensors.length,
      "duplicate tensor name")
    val out = new java.io.ByteArrayOutputStream(1024)
    def u32(v: Long): Unit = { var i = 0
      while (i < 4) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 } }
    def u64(v: Long): Unit = { var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 } }
    def gstr(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      u64(b.length.toLong); out.write(b, 0, b.length)
    }
    def value(v: Gv): Unit = v match {
      case GvU8(x) => out.write(x & 0xff)
      case GvI8(x) => out.write(x & 0xff)
      case GvU16(x) => out.write(x & 0xff); out.write((x >> 8) & 0xff)
      case GvI16(x) => out.write(x & 0xff); out.write((x >> 8) & 0xff)
      case GvU32(x) => u32(x)
      case GvI32(x) => u32(x.toLong)
      case GvF32(x) => u32(java.lang.Float.floatToIntBits(x).toLong)
      case GvBool(x) => out.write(if (x) 1 else 0)
      case GvStr(x) => gstr(x)
      case GvArr(tpe, vs) =>
        u32(tpe.toLong); u64(vs.length.toLong)
        vs.foreach { e =>
          require(typeOf(e) == tpe, "heterogeneous gguf array")
          require(tpe != 9, "nested gguf arrays")
          value(e)
        }
      case GvU64(x) => u64(x)
      case GvI64(x) => u64(x)
      case GvF64(x) => u64(java.lang.Double.doubleToLongBits(x))
    }
    out.write("GGUF".getBytes("ASCII"))
    u32(3L)
    u64(tensors.length.toLong)
    u64(metadata.length.toLong)
    metadata.foreach { case (k, v) =>
      gstr(k); u32(typeOf(v).toLong); value(v)
    }
    var off = 0L
    val offsets = tensors.map { t =>
      require(t.dims.nonEmpty && t.dims.forall(_ > 0),
        s"tensor ${t.name}: dims must be positive")
      require(t.elems <= MaxElems, s"tensor ${t.name} too large")
      val sz = byteSize(t.tpe, t.elems).getOrElse(
        sys.error(s"tensor ${t.name}: type ${t.tpe}"))
      require(t.data.length.toLong == sz,
        s"tensor ${t.name}: ${t.data.length} bytes, expected $sz")
      val o = off
      off = (o + sz + alignment - 1) / alignment * alignment
      o
    }
    tensors.zip(offsets).foreach { case (t, o) =>
      gstr(t.name)
      u32(t.dims.length.toLong)
      t.dims.foreach(u64)
      u32(TypeIds(t.tpe).toLong)
      u64(o)
    }
    // pad to alignment, then the data section (each tensor padded
    // up to the next alignment boundary, except after the last)
    while (out.size() % alignment != 0) out.write(0)
    tensors.zip(offsets).zipWithIndex.foreach { case ((t, o), i) =>
      out.write(t.data)
      if (i != tensors.length - 1) {
        val end = o + t.data.length
        var pad = ((alignment - (end % alignment)) % alignment).toInt
        while (pad > 0) { out.write(0); pad -= 1 }
      }
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Parse
  // ---------------------------------------------------------------

  private final class Cur(val data: Array[Byte]) {
    var p = 0
    var ok = true
    def u8(): Int =
      if (p >= data.length) { ok = false; 0 }
      else { val b = data(p) & 0xff; p += 1; b }
    def u32(): Long = {
      var v = 0L; var i = 0
      while (i < 4 && ok) { v |= u8().toLong << (8 * i); i += 1 }
      v
    }
    def u64(): Long = {
      var v = 0L; var i = 0
      while (i < 8 && ok) { v |= u8().toLong << (8 * i); i += 1 }
      v
    }
    def take(n: Long): Array[Byte] =
      if (n < 0 || n > data.length - p) { ok = false; Array.emptyByteArray }
      else { val r = java.util.Arrays.copyOfRange(data, p, p + n.toInt)
        p += n.toInt; r }
  }

  /** None on any malformation. Metadata keeps declaration order. */
  def parse(data: Array[Byte])
      : Option[(Seq[(String, Gv)], Seq[GTensor])] = {
    val c = new Cur(data)
    if (!new String(c.take(4), "ASCII").equals("GGUF") || !c.ok)
      return None
    if (c.u32() != 3L) return None // v1/v2 use 32-bit counts — reject
    val nTensors = c.u64()
    val nKv = c.u64()
    if (!c.ok || nTensors < 0 || nTensors > MaxCount ||
      nKv < 0 || nKv > MaxCount) return None

    def gstr(): Option[String] = {
      val n = c.u64()
      if (!c.ok || n < 0 || n > MaxStr) { c.ok = false; return None }
      val b = c.take(n)
      if (!c.ok) return None
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      try Some(dec.decode(java.nio.ByteBuffer.wrap(b)).toString)
      catch { case _: java.nio.charset.CharacterCodingException =>
        c.ok = false; None }
    }

    def value(tpe: Int, depth: Int): Option[Gv] = {
      if (!c.ok) return None
      tpe match {
        case 0 => Some(GvU8(c.u8()))
        case 1 => Some(GvI8(c.u8().toByte.toInt))
        case 2 => Some(GvU16((c.u8() | (c.u8() << 8)) & 0xffff))
        case 3 => Some(GvI16((c.u8() | (c.u8() << 8)).toShort.toInt))
        case 4 => Some(GvU32(c.u32()))
        case 5 => Some(GvI32(c.u32().toInt))
        case 6 => Some(GvF32(java.lang.Float.intBitsToFloat(
          c.u32().toInt)))
        case 7 => c.u8() match {
          case 0 => Some(GvBool(false))
          case 1 => Some(GvBool(true))
          case _ => c.ok = false; None
        }
        case 8 => gstr().map(GvStr)
        case 9 =>
          if (depth > 0) { c.ok = false; return None } // one level
          val et = c.u32().toInt
          val n = c.u64()
          if (!c.ok || n < 0 || n > MaxCount || et == 9) {
            c.ok = false; return None }
          val vs = Seq.newBuilder[Gv]
          var i = 0L
          while (c.ok && i < n) {
            value(et, depth + 1) match {
              case Some(x) => vs += x
              case None => c.ok = false
            }
            i += 1
          }
          if (c.ok) Some(GvArr(et, vs.result())) else None
        case 10 => Some(GvU64(c.u64()))
        case 11 => Some(GvI64(c.u64()))
        case 12 => Some(GvF64(java.lang.Double.longBitsToDouble(
          c.u64())))
        case _ => c.ok = false; None
      }
    }

    val kvs = Seq.newBuilder[(String, Gv)]
    var alignment = 32L
    var i = 0L
    while (c.ok && i < nKv) {
      val k = gstr().getOrElse(return None)
      val t = c.u32().toInt
      value(t, 0) match {
        case Some(v) =>
          if (k == "general.alignment") v match {
            case GvU32(a) if a > 0 && (a & (a - 1)) == 0 =>
              alignment = a
            case _ => c.ok = false
          }
          kvs += ((k, v))
        case None => c.ok = false
      }
      i += 1
    }
    if (!c.ok) return None

    final case class Info(name: String, dims: Seq[Long], tag: String,
        offset: Long, size: Long)
    val infos = Seq.newBuilder[Info]
    i = 0L
    while (c.ok && i < nTensors) {
      val name = gstr().getOrElse(return None)
      val nd = c.u32()
      if (!c.ok || nd < 1 || nd > 8) return None
      val dims = (0L until nd).map(_ => c.u64())
      if (!c.ok || dims.exists(_ <= 0)) return None
      var elems = 1L
      dims.foreach { d =>
        elems *= d
        if (elems > MaxElems) { c.ok = false } }
      if (!c.ok) return None
      val tid = c.u32().toInt
      val tag = TypeTags.getOrElse(tid, { c.ok = false; return None })
      val off = c.u64()
      if (!c.ok || off < 0 || off % alignment != 0) return None
      val sz = byteSize(tag, elems).getOrElse { c.ok = false
        return None }
      infos += Info(name, dims, tag, off, sz)
      i += 1
    }
    if (!c.ok) return None
    val infoSeq = infos.result()
    if (infoSeq.map(_.name).distinct.length != infoSeq.length)
      return None

    // data section starts at the next alignment boundary
    val dataStart = (c.p.toLong + alignment - 1) / alignment * alignment
    if (dataStart > data.length) return None
    // canonical layout: offsets tile the section in declared order
    var expect = 0L
    infoSeq.foreach { t =>
      if (t.offset != expect) return None
      expect = (t.offset + t.size + alignment - 1) /
        alignment * alignment
    }
    val lastEnd = infoSeq.lastOption
      .map(t => t.offset + t.size).getOrElse(0L)
    if (dataStart + lastEnd != data.length) return None

    val tensors = infoSeq.map { t =>
      GTensor(t.name, t.dims, t.tag,
        java.util.Arrays.copyOfRange(data,
          (dataStart + t.offset).toInt,
          (dataStart + t.offset + t.size).toInt))
    }
    Some((kvs.result(), tensors))
  }

  // ---------------------------------------------------------------
  // Q8_0 — the closed-form block quantization
  // ---------------------------------------------------------------

  /** n must be a multiple of 32. Per 32-block: f16 scale
    * d = max|x|/127, then 32 bytes round(x/d) (0 scale → 0s). */
  def quantizeQ8_0(xs: Array[Float]): Array[Byte] = {
    require(xs.length % 32 == 0, "Q8_0 needs 32-element blocks")
    val out = ByteBuffer.allocate(xs.length / 32 * 34)
      .order(ByteOrder.LITTLE_ENDIAN)
    var b = 0
    while (b < xs.length) {
      var amax = 0f
      var j = 0
      while (j < 32) {
        val a = math.abs(xs(b + j)); if (a > amax) amax = a; j += 1
      }
      val dHalf = Safetensors.floatToHalf(amax / 127f)
      val d = Safetensors.halfToFloat(dHalf & 0xffff)
      out.putShort(dHalf)
      j = 0
      while (j < 32) {
        val q = if (d == 0f) 0
          else math.max(-127, math.min(127,
            math.round(xs(b + j) / d)))
        out.put(q.toByte)
        j += 1
      }
      b += 32
    }
    out.array()
  }

  def dequantizeQ8_0(data: Array[Byte]): Array[Float] = {
    require(data.length % 34 == 0, "Q8_0 data is 34-byte blocks")
    val in = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](data.length / 34 * 32)
    var b = 0
    while (b < out.length) {
      val d = Safetensors.halfToFloat(in.getShort() & 0xffff)
      var j = 0
      while (j < 32) { out(b + j) = in.get() * d; j += 1 }
      b += 32
    }
    out
  }

  // ---------------------------------------------------------------
  // Q4_0 / Q4_1 / Q5_0 / Q5_1 — the rest of the closed-form family.
  // Shared split layout: within each 32-block the FIRST 16 lanes go
  // in the low nibbles of qs[0..15] and the SECOND 16 in the high
  // nibbles (ggml's SIMD-friendly split, not interleaved pairs).
  // ---------------------------------------------------------------

  private def half(x: Float): (Short, Float) = {
    val h = Safetensors.floatToHalf(x)
    (h, Safetensors.halfToFloat(h & 0xffff))
  }

  /** Q4_0: d = signedmax/-8 (the max-|x| element keeps its sign so
    * the extreme lane lands exactly on code 0), q = trunc(x/d+8.5)
    * clamped to 15, x back = (q-8)·d. 18-byte blocks of 32. */
  def quantizeQ4_0(xs: Array[Float]): Array[Byte] = {
    require(xs.length % 32 == 0, "Q4_0 needs 32-element blocks")
    val out = ByteBuffer.allocate(xs.length / 32 * 18)
      .order(ByteOrder.LITTLE_ENDIAN)
    var b = 0
    while (b < xs.length) {
      var amax = 0f; var smax = 0f
      var j = 0
      while (j < 32) {
        val v = xs(b + j)
        if (math.abs(v) > amax) { amax = math.abs(v); smax = v }
        j += 1
      }
      val (dh, d) = half(smax / -8f)
      val id = if (d == 0f) 0f else 1f / d
      out.putShort(dh)
      j = 0
      while (j < 16) {
        val q0 = math.min(15, (xs(b + j) * id + 8.5f).toInt)
        val q1 = math.min(15, (xs(b + 16 + j) * id + 8.5f).toInt)
        out.put(((q0 & 0x0f) | ((q1 & 0x0f) << 4)).toByte)
        j += 1
      }
      b += 32
    }
    out.array()
  }

  def dequantizeQ4_0(data: Array[Byte]): Array[Float] = {
    require(data.length % 18 == 0, "Q4_0 data is 18-byte blocks")
    val in = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](data.length / 18 * 32)
    var b = 0
    while (b < out.length) {
      val d = Safetensors.halfToFloat(in.getShort() & 0xffff)
      var j = 0
      while (j < 16) {
        val q = in.get() & 0xff
        out(b + j) = ((q & 0x0f) - 8) * d
        out(b + 16 + j) = ((q >>> 4) - 8) * d
        j += 1
      }
      b += 32
    }
    out
  }

  /** Q4_1: affine — d = (max-min)/15, m = min, q = trunc((x-m)/d
    * + 0.5), x back = q·d + m. 20-byte blocks of 32. */
  def quantizeQ4_1(xs: Array[Float]): Array[Byte] = {
    require(xs.length % 32 == 0, "Q4_1 needs 32-element blocks")
    val out = ByteBuffer.allocate(xs.length / 32 * 20)
      .order(ByteOrder.LITTLE_ENDIAN)
    var b = 0
    while (b < xs.length) {
      var mn = xs(b); var mx = xs(b)
      var j = 1
      while (j < 32) {
        val v = xs(b + j)
        if (v < mn) mn = v; if (v > mx) mx = v
        j += 1
      }
      val (dh, d) = half((mx - mn) / 15f)
      val (mh, _) = half(mn)
      val id = if (d == 0f) 0f else 1f / d
      out.putShort(dh); out.putShort(mh)
      j = 0
      while (j < 16) {
        val q0 = math.min(15, ((xs(b + j) - mn) * id + 0.5f).toInt)
        val q1 = math.min(15,
          ((xs(b + 16 + j) - mn) * id + 0.5f).toInt)
        out.put(((q0 & 0x0f) | ((q1 & 0x0f) << 4)).toByte)
        j += 1
      }
      b += 32
    }
    out.array()
  }

  def dequantizeQ4_1(data: Array[Byte]): Array[Float] = {
    require(data.length % 20 == 0, "Q4_1 data is 20-byte blocks")
    val in = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](data.length / 20 * 32)
    var b = 0
    while (b < out.length) {
      val d = Safetensors.halfToFloat(in.getShort() & 0xffff)
      val m = Safetensors.halfToFloat(in.getShort() & 0xffff)
      var j = 0
      while (j < 16) {
        val q = in.get() & 0xff
        out(b + j) = (q & 0x0f) * d + m
        out(b + 16 + j) = (q >>> 4) * d + m
        j += 1
      }
      b += 32
    }
    out
  }

  /** Q5_0: d = signedmax/-16, q = trunc(x/d+16.5) clamped to 31;
    * low 4 bits in the nibble plane, 5th bit of lane j at qh bit j
    * (second half at bit j+16). 22-byte blocks of 32. */
  def quantizeQ5_0(xs: Array[Float]): Array[Byte] = {
    require(xs.length % 32 == 0, "Q5_0 needs 32-element blocks")
    val out = ByteBuffer.allocate(xs.length / 32 * 22)
      .order(ByteOrder.LITTLE_ENDIAN)
    var b = 0
    while (b < xs.length) {
      var amax = 0f; var smax = 0f
      var j = 0
      while (j < 32) {
        val v = xs(b + j)
        if (math.abs(v) > amax) { amax = math.abs(v); smax = v }
        j += 1
      }
      val (dh, d) = half(smax / -16f)
      val id = if (d == 0f) 0f else 1f / d
      out.putShort(dh)
      var qh = 0
      val qs = new Array[Byte](16)
      j = 0
      while (j < 16) {
        val q0 = math.min(31, (xs(b + j) * id + 16.5f).toInt)
        val q1 = math.min(31, (xs(b + 16 + j) * id + 16.5f).toInt)
        qs(j) = ((q0 & 0x0f) | ((q1 & 0x0f) << 4)).toByte
        qh |= ((q0 & 0x10) >>> 4) << j
        qh |= ((q1 & 0x10) >>> 4) << (j + 16)
        j += 1
      }
      out.putInt(qh)
      out.put(qs)
      b += 32
    }
    out.array()
  }

  def dequantizeQ5_0(data: Array[Byte]): Array[Float] = {
    require(data.length % 22 == 0, "Q5_0 data is 22-byte blocks")
    val in = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](data.length / 22 * 32)
    var b = 0
    while (b < out.length) {
      val d = Safetensors.halfToFloat(in.getShort() & 0xffff)
      val qh = in.getInt()
      var j = 0
      while (j < 16) {
        val q = in.get() & 0xff
        val h0 = ((qh >>> j) << 4) & 0x10
        val h1 = (qh >>> (j + 12)) & 0x10
        out(b + j) = (((q & 0x0f) | h0) - 16) * d
        out(b + 16 + j) = (((q >>> 4) | h1) - 16) * d
        j += 1
      }
      b += 32
    }
    out
  }

  /** Q5_1: affine 5-bit — d = (max-min)/31, m = min, same qh bit
    * plane as Q5_0, x back = q·d + m. 24-byte blocks of 32. */
  def quantizeQ5_1(xs: Array[Float]): Array[Byte] = {
    require(xs.length % 32 == 0, "Q5_1 needs 32-element blocks")
    val out = ByteBuffer.allocate(xs.length / 32 * 24)
      .order(ByteOrder.LITTLE_ENDIAN)
    var b = 0
    while (b < xs.length) {
      var mn = xs(b); var mx = xs(b)
      var j = 1
      while (j < 32) {
        val v = xs(b + j)
        if (v < mn) mn = v; if (v > mx) mx = v
        j += 1
      }
      val (dh, d) = half((mx - mn) / 31f)
      val (mh, _) = half(mn)
      val id = if (d == 0f) 0f else 1f / d
      out.putShort(dh); out.putShort(mh)
      var qh = 0
      val qs = new Array[Byte](16)
      j = 0
      while (j < 16) {
        val q0 = math.min(31, ((xs(b + j) - mn) * id + 0.5f).toInt)
        val q1 = math.min(31,
          ((xs(b + 16 + j) - mn) * id + 0.5f).toInt)
        qs(j) = ((q0 & 0x0f) | ((q1 & 0x0f) << 4)).toByte
        qh |= ((q0 & 0x10) >>> 4) << j
        qh |= ((q1 & 0x10) >>> 4) << (j + 16)
        j += 1
      }
      out.putInt(qh)
      out.put(qs)
      b += 32
    }
    out.array()
  }

  def dequantizeQ5_1(data: Array[Byte]): Array[Float] = {
    require(data.length % 24 == 0, "Q5_1 data is 24-byte blocks")
    val in = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](data.length / 24 * 32)
    var b = 0
    while (b < out.length) {
      val d = Safetensors.halfToFloat(in.getShort() & 0xffff)
      val m = Safetensors.halfToFloat(in.getShort() & 0xffff)
      val qh = in.getInt()
      var j = 0
      while (j < 16) {
        val q = in.get() & 0xff
        val h0 = ((qh >>> j) << 4) & 0x10
        val h1 = (qh >>> (j + 12)) & 0x10
        out(b + j) = ((q & 0x0f) | h0) * d + m
        out(b + 16 + j) = ((q >>> 4) | h1) * d + m
        j += 1
      }
      b += 32
    }
    out
  }

  /** F32 lane accessor for a parsed tensor. */
  def f32At(t: GTensor, i: Int): Float = {
    require(t.tpe == "F32")
    ByteBuffer.wrap(t.data).order(ByteOrder.LITTLE_ENDIAN)
      .getFloat(i * 4)
  }

  def i64At(t: GTensor, i: Int): Long = {
    require(t.tpe == "I64")
    ByteBuffer.wrap(t.data).order(ByteOrder.LITTLE_ENDIAN)
      .getLong(i * 8)
  }
}
