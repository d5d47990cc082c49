package graft.operators

/** CBOR (RFC 8949) — MessagePack's IETF sibling, the binary JSON of
  * COSE, WebAuthn and sensor/IoT record streams; corpora collected
  * from such systems carry CBOR payloads per record. Pure-JVM, both
  * directions, entirely closed-form from the RFC:
  *
  *  - [[encode]] emits the DETERMINISTIC core encoding (§4.2.1):
  *    shortest-form argument lengths, definite lengths only, floats
  *    at their stated width (CbFloat → binary32, CbDouble →
  *    binary64 — no cross-width shortening, so encode∘decode is the
  *    identity on canonical values and byte-exact round trips pin
  *    it).
  *  - [[decode]] additionally accepts the full wire grammar:
  *    indefinite-length strings (definite same-major chunks,
  *    concatenated), indefinite arrays/maps ("break" 0xff),
  *    binary16 floats (via the shared half-float arithmetic in
  *    [[Safetensors]]), tags (kept as [[CbTag]] wrappers, nestable)
  *    and simple values.
  *
  * Integers: major 0 values above Long.MaxValue surface as
  * [[CbUint]] raw bits (like [[Msgpack.MpUint]]); major 1 values
  * below Long.MinValue reject honestly (no BigInt in the value
  * model). The decoder enforces exact input consumption, nesting
  * depth ≤ 64, a total element budget (a 9-byte array header can
  * claim 2^64 elements), well-formedness of indefinite chunks
  * (sub-chunks must be definite and same-major, RFC §3.2.3) and
  * strict UTF-8. None on any malformation — drop, never invent.
  * Validation is RFC 8949 Appendix A's own example vectors,
  * hand-pinned layouts per family, round trips and fuzz —
  * CborSpec. */
object Cbor {

  sealed trait Cb
  case object CbNull extends Cb
  case object CbUndef extends Cb
  final case class CbBool(v: Boolean) extends Cb
  /** Any integer representable in a signed 64-bit Long. */
  final case class CbInt(v: Long) extends Cb
  /** Major-0 uint ABOVE Long.MaxValue — raw bits. */
  final case class CbUint(raw: Long) extends Cb
  final case class CbFloat(v: Float) extends Cb
  final case class CbDouble(v: Double) extends Cb
  final case class CbStr(v: String) extends Cb
  final case class CbBytes(v: Array[Byte]) extends Cb
  final case class CbArr(vs: Seq[Cb]) extends Cb
  final case class CbMap(kvs: Seq[(Cb, Cb)]) extends Cb
  final case class CbTag(tag: Long, v: Cb) extends Cb
  /** Simple values other than false/true/null/undefined. */
  final case class CbSimple(v: Int) extends Cb

  private final val MaxDepth = 64
  private final val MaxElems = 1 << 24 // total element budget

  // ---------------------------------------------------------------
  // Encode (deterministic core: shortest args, definite lengths)
  // ---------------------------------------------------------------

  def encode(v: Cb): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    enc(out, v, 0)
    out.toByteArray
  }

  /** Major type + shortest-form argument (§4.2.1). */
  private def head(out: java.io.ByteArrayOutputStream, major: Int,
      arg: Long): Unit = {
    val m = major << 5
    if (arg >= 0 && arg < 24) out.write(m | arg.toInt)
    else if (arg >= 0 && arg <= 0xff) { out.write(m | 24)
      out.write(arg.toInt) }
    else if (arg >= 0 && arg <= 0xffff) { out.write(m | 25)
      out.write((arg >> 8).toInt); out.write((arg & 0xff).toInt) }
    else if (arg >= 0 && arg <= 0xffffffffL) {
      out.write(m | 26)
      var i = 3
      while (i >= 0) { out.write(((arg >>> (8 * i)) & 0xff).toInt)
        i -= 1 }
    } else { // 64-bit (also raw-bits uints with the sign bit set)
      out.write(m | 27)
      var i = 7
      while (i >= 0) { out.write(((arg >>> (8 * i)) & 0xff).toInt)
        i -= 1 }
    }
  }

  private def enc(out: java.io.ByteArrayOutputStream, v: Cb,
      depth: Int): Unit = {
    require(depth <= MaxDepth, "cbor nesting too deep")
    v match {
      case CbInt(n) =>
        if (n >= 0) head(out, 0, n)
        else head(out, 1, -1 - n) // -1-n is the major-1 argument
      case CbUint(raw) => head(out, 0, raw)
      case CbBytes(b) => head(out, 2, b.length.toLong); out.write(b)
      case CbStr(s) =>
        val b = s.getBytes("UTF-8")
        head(out, 3, b.length.toLong); out.write(b)
      case CbArr(vs) =>
        head(out, 4, vs.length.toLong)
        vs.foreach(enc(out, _, depth + 1))
      case CbMap(kvs) =>
        head(out, 5, kvs.length.toLong)
        kvs.foreach { case (k, x) =>
          enc(out, k, depth + 1); enc(out, x, depth + 1) }
      case CbTag(t, x) =>
        require(t >= 0, "negative tag")
        head(out, 6, t); enc(out, x, depth + 1)
      case CbBool(b) => out.write(if (b) 0xf5 else 0xf4)
      case CbNull => out.write(0xf6)
      case CbUndef => out.write(0xf7)
      case CbSimple(s) =>
        require(s >= 0 && s <= 255 &&
          (s < 20 || s > 31), s"reserved simple $s")
        if (s < 24) out.write(0xe0 | s)
        else { out.write(0xf8); out.write(s) }
      case CbFloat(f) =>
        out.write(0xfa)
        val bits = java.lang.Float.floatToIntBits(f)
        var i = 3
        while (i >= 0) { out.write((bits >>> (8 * i)) & 0xff); i -= 1 }
      case CbDouble(d) =>
        out.write(0xfb)
        val bits = java.lang.Double.doubleToLongBits(d)
        var i = 7
        while (i >= 0) { out.write(((bits >>> (8 * i)) & 0xff).toInt)
          i -= 1 }
    }
  }

  // ---------------------------------------------------------------
  // Decode
  // ---------------------------------------------------------------

  private final class Cur(val data: Array[Byte]) {
    var p = 0
    var ok = true
    var elems = 0
    def u8(): Int = {
      if (p >= data.length) { ok = false; 0 }
      else { val b = data(p) & 0xff; p += 1; b }
    }
    def beLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n && ok) { v = (v << 8) | u8(); i += 1 }
      v
    }
    def bytes(n: Long): Array[Byte] = {
      if (n < 0 || n > data.length - p) { ok = false; Array.emptyByteArray }
      else { val r = java.util.Arrays.copyOfRange(data, p, p + n.toInt)
        p += n.toInt; r }
    }
    def budget(): Unit = {
      elems += 1
      if (elems > MaxElems) ok = false
    }
  }

  /** Strict single-item decode: exact consumption, None on any
    * malformation. */
  def decode(data: Array[Byte]): Option[Cb] = {
    val c = new Cur(data)
    val v = item(c, 0)
    if (c.ok && c.p == data.length) v else None
  }

  /** (initial byte, argument) — argument is the value/length/tag.
    * Returns (major, argOrNegOneForIndefinite). */
  private def header(c: Cur): (Int, Long) = {
    val ib = c.u8()
    if (!c.ok) return (-1, 0)
    val major = ib >> 5
    val ai = ib & 0x1f
    val arg: Long = ai match {
      case 24 => c.beLong(1)
      case 25 => c.beLong(2)
      case 26 => c.beLong(4)
      case 27 => c.beLong(8)
      case 28 | 29 | 30 => c.ok = false; 0
      case 31 =>
        // indefinite: only bytes/text/array/map (and break, handled
        // by callers that expect it)
        if (major < 2 || major == 6) { c.ok = false }
        -1L
      case small => small.toLong
    }
    (major, arg)
  }

  private def item(c: Cur, depth: Int): Option[Cb] = {
    if (depth > MaxDepth) { c.ok = false; return None }
    c.budget()
    if (!c.ok) return None
    val startIb = if (c.p < c.data.length) c.data(c.p) & 0xff else -1
    if (startIb == 0xff) { c.ok = false; return None } // stray break
    val (major, arg) = header(c)
    if (!c.ok) return None
    major match {
      case 0 =>
        Some(if (arg < 0) CbUint(arg) else CbInt(arg))
      case 1 =>
        if (arg < 0) { c.ok = false; None } // below Long.MinValue
        else Some(CbInt(-1 - arg))
      case 2 =>
        if (arg >= 0) Some(CbBytes(c.bytes(arg))).filter(_ => c.ok)
        else chunks(c, 2).map(CbBytes)
      case 3 =>
        if (arg >= 0) utf8(c.bytes(arg), c).map(CbStr)
        else chunks(c, 3).flatMap(b => utf8(b, c)).map(CbStr)
      case 4 =>
        val vs = Seq.newBuilder[Cb]
        if (arg >= 0) {
          if (arg > MaxElems) { c.ok = false; return None }
          var i = 0L
          while (c.ok && i < arg) {
            item(c, depth + 1) match {
              case Some(x) => vs += x
              case None => c.ok = false
            }
            i += 1
          }
        } else {
          var more = true
          while (c.ok && more) {
            if (c.p < c.data.length && (c.data(c.p) & 0xff) == 0xff) {
              c.p += 1; more = false
            } else item(c, depth + 1) match {
              case Some(x) => vs += x
              case None => c.ok = false
            }
          }
        }
        if (c.ok) Some(CbArr(vs.result())) else None
      case 5 =>
        val kvs = Seq.newBuilder[(Cb, Cb)]
        if (arg >= 0) {
          if (arg > MaxElems) { c.ok = false; return None }
          var i = 0L
          while (c.ok && i < arg) {
            (item(c, depth + 1), item(c, depth + 1)) match {
              case (Some(k), Some(x)) => kvs += ((k, x))
              case _ => c.ok = false
            }
            i += 1
          }
        } else {
          var more = true
          while (c.ok && more) {
            if (c.p < c.data.length && (c.data(c.p) & 0xff) == 0xff) {
              c.p += 1; more = false
            } else (item(c, depth + 1), item(c, depth + 1)) match {
              case (Some(k), Some(x)) => kvs += ((k, x))
              case _ => c.ok = false
            }
          }
        }
        if (c.ok) Some(CbMap(kvs.result())) else None
      case 6 =>
        if (arg < 0) { c.ok = false; None } // tags can't be indefinite
        else item(c, depth + 1).map(CbTag(arg, _))
      case 7 =>
        val ai = arg
        (startIb & 0x1f) match {
          case 20 => Some(CbBool(false))
          case 21 => Some(CbBool(true))
          case 22 => Some(CbNull)
          case 23 => Some(CbUndef)
          case 24 => // simple value in the next byte; must be ≥ 32
            if (ai < 32 || ai > 255) { c.ok = false; None }
            else Some(CbSimple(ai.toInt))
          case 25 =>
            Some(CbFloat(Safetensors.halfToFloat(ai.toInt & 0xffff)))
          case 26 => Some(CbFloat(
            java.lang.Float.intBitsToFloat(ai.toInt)))
          case 27 => Some(CbDouble(
            java.lang.Double.longBitsToDouble(ai)))
          case s if s < 20 => Some(CbSimple(s))
          case _ => c.ok = false; None // 28-30 reserved, 31 break
        }
      case _ => None
    }
  }

  /** Indefinite-length string chunks: definite, same major type,
    * no nesting (RFC §3.2.3). The leading 0x5f/0x7f is consumed. */
  private def chunks(c: Cur, major: Int): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var more = true
    while (c.ok && more) {
      if (c.p >= c.data.length) { c.ok = false }
      else if ((c.data(c.p) & 0xff) == 0xff) { c.p += 1; more = false }
      else {
        c.budget()
        val (m, arg) = header(c)
        if (!c.ok || m != major || arg < 0) c.ok = false
        else {
          val b = c.bytes(arg)
          if (c.ok) out.write(b, 0, b.length)
        }
      }
    }
    if (c.ok) Some(out.toByteArray) else None
  }

  private def utf8(b: Array[Byte], c: Cur): Option[String] = {
    if (!c.ok) return None
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    try Some(dec.decode(java.nio.ByteBuffer.wrap(b)).toString)
    catch { case _: java.nio.charset.CharacterCodingException =>
      c.ok = false; None }
  }
}
