package graft.operators

/** MessagePack (the public spec, msgpack.org) — the compact binary
  * JSON used by data-pipeline RPC layers, feature stores and log
  * shippers; an ingest engine meets it as record payloads inside
  * queues and KV dumps. Pure-JVM, both directions, entirely
  * closed-form: all format families — nil / bool / fix+sized ints
  * (signed and unsigned up to raw uint64) / float32/64 / fixstr +
  * str8/16/32 / bin8/16/32 / fixarray + array16/32 / fixmap +
  * map16/32 / fixext1..16 + ext8/16/32 (timestamp ext kept opaque).
  *
  * The encoder is MINIMAL-SIZE (the spec's recommendation), so
  * encode∘decode is the identity on canonical values and byte-exact
  * round trips pin it. The decoder enforces: exact input consumption
  * (trailing bytes reject), nesting depth ≤ 64, total element budget
  * (decompression-bomb guard — a 16-byte array32 header can claim
  * 2^32 elements), and UTF-8 strings. None on any malformation —
  * drop, never invent. No bundled JVM implementation exists to
  * differential against (unlike [[Zstd]]/[[Xz]]/[[Avro]]), so
  * validation is the spec's own published example bytes, hand-pinned
  * layouts per family, exhaustive round trips and fuzz —
  * MsgpackSpec. */
object Msgpack {

  sealed trait Mp
  case object MpNil extends Mp
  final case class MpBool(v: Boolean) extends Mp
  /** Signed 64-bit values (every int family that fits a Long). */
  final case class MpInt(v: Long) extends Mp
  /** uint64 ABOVE Long.MaxValue — raw bits. */
  final case class MpUint(raw: Long) extends Mp
  final case class MpFloat(v: Float) extends Mp
  final case class MpDouble(v: Double) extends Mp
  final case class MpStr(v: String) extends Mp
  final case class MpBin(v: Array[Byte]) extends Mp
  final case class MpArr(vs: Seq[Mp]) extends Mp
  final case class MpMap(kvs: Seq[(Mp, Mp)]) extends Mp
  final case class MpExt(tpe: Byte, data: Array[Byte]) extends Mp

  // ---------------------------------------------------------------
  // Encode (minimal-size forms)
  // ---------------------------------------------------------------

  def encode(v: Mp): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    enc(out, v, 0)
    out.toByteArray
  }

  private def be(out: java.io.ByteArrayOutputStream, v: Long,
      bytes: Int): Unit = {
    var i = bytes - 1
    while (i >= 0) { out.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  private def enc(out: java.io.ByteArrayOutputStream, v: Mp,
      depth: Int): Unit = {
    require(depth <= 64, "msgpack nesting too deep")
    v match {
      case MpNil => out.write(0xc0)
      case MpBool(b) => out.write(if (b) 0xc3 else 0xc2)
      case MpInt(n) =>
        if (n >= 0) {
          if (n < 128) out.write(n.toInt)
          else if (n < 256) { out.write(0xcc); out.write(n.toInt) }
          else if (n < 65536) { out.write(0xcd); be(out, n, 2) }
          else if (n < (1L << 32)) { out.write(0xce); be(out, n, 4) }
          else { out.write(0xcf); be(out, n, 8) }
        } else {
          if (n >= -32) out.write(0xe0 | (n & 0x1f).toInt)
          else if (n >= Byte.MinValue) { out.write(0xd0); out.write(n.toInt) }
          else if (n >= Short.MinValue) { out.write(0xd1); be(out, n, 2) }
          else if (n >= Int.MinValue) { out.write(0xd2); be(out, n, 4) }
          else { out.write(0xd3); be(out, n, 8) }
        }
      case MpUint(raw) =>
        require(raw < 0, "MpUint is only for uint64 above Long.MaxValue")
        out.write(0xcf); be(out, raw, 8)
      case MpFloat(f) =>
        out.write(0xca); be(out, java.lang.Float.floatToIntBits(f) & 0xffffffffL, 4)
      case MpDouble(d) =>
        out.write(0xcb); be(out, java.lang.Double.doubleToLongBits(d), 8)
      case MpStr(s) =>
        val b = s.getBytes("UTF-8")
        if (b.length < 32) out.write(0xa0 | b.length)
        else if (b.length < 256) { out.write(0xd9); out.write(b.length) }
        else if (b.length < 65536) { out.write(0xda); be(out, b.length, 2) }
        else { out.write(0xdb); be(out, b.length, 4) }
        out.write(b)
      case MpBin(b) =>
        if (b.length < 256) { out.write(0xc4); out.write(b.length) }
        else if (b.length < 65536) { out.write(0xc5); be(out, b.length, 2) }
        else { out.write(0xc6); be(out, b.length, 4) }
        out.write(b)
      case MpArr(vs) =>
        if (vs.length < 16) out.write(0x90 | vs.length)
        else if (vs.length < 65536) { out.write(0xdc); be(out, vs.length, 2) }
        else { out.write(0xdd); be(out, vs.length, 4) }
        vs.foreach(enc(out, _, depth + 1))
      case MpMap(kvs) =>
        if (kvs.length < 16) out.write(0x80 | kvs.length)
        else if (kvs.length < 65536) { out.write(0xde); be(out, kvs.length, 2) }
        else { out.write(0xdf); be(out, kvs.length, 4) }
        kvs.foreach { case (k, x) =>
          enc(out, k, depth + 1); enc(out, x, depth + 1)
        }
      case MpExt(t, d) =>
        d.length match {
          case 1 => out.write(0xd4)
          case 2 => out.write(0xd5)
          case 4 => out.write(0xd6)
          case 8 => out.write(0xd7)
          case 16 => out.write(0xd8)
          case n if n < 256 => out.write(0xc7); out.write(n)
          case n if n < 65536 => out.write(0xc8); be(out, n, 2)
          case n => out.write(0xc9); be(out, n, 4)
        }
        out.write(t & 0xff)
        out.write(d)
    }
  }

  // ---------------------------------------------------------------
  // Decode
  // ---------------------------------------------------------------

  private final class Dec(val b: Array[Byte]) {
    var p = 0
    var budget = 1 << 22 // total element bomb guard
    def fail(): Nothing = throw Bad
    def u8(): Int = {
      if (p >= b.length) fail()
      val v = b(p) & 0xff
      p += 1
      v
    }
    def beN(n: Int): Long = {
      if (p + n > b.length) fail()
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
      p += n
      v
    }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || p + n > b.length) fail()
      val r = java.util.Arrays.copyOfRange(b, p, p + n)
      p += n
      r
    }
    def spend(n: Long): Unit = {
      if (n < 0 || n > budget) fail()
      budget -= n.toInt
    }
  }

  private object Bad extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  /** Decode ONE value covering the whole input; None on trailing
    * bytes or any malformation. Never throws. */
  def decode(data: Array[Byte]): Option[Mp] =
    try {
      val d = new Dec(data)
      val v = dec(d, 0)
      if (d.p != data.length) None else Some(v)
    } catch { case Bad => None }

  private def dec(d: Dec, depth: Int): Mp = {
    if (depth > 64) d.fail()
    d.spend(1)
    val t = d.u8()
    if (t < 0x80) MpInt(t)
    else if (t >= 0xe0) MpInt((t - 256).toLong)
    else if ((t & 0xf0) == 0x80) decMap(d, t & 15, depth)
    else if ((t & 0xf0) == 0x90) decArr(d, t & 15, depth)
    else if ((t & 0xe0) == 0xa0) decStr(d, t & 31)
    else t match {
      case 0xc0 => MpNil
      case 0xc2 => MpBool(false)
      case 0xc3 => MpBool(true)
      case 0xc4 => MpBin(d.bytes(d.beN(1).toInt))
      case 0xc5 => MpBin(d.bytes(d.beN(2).toInt))
      case 0xc6 => MpBin(d.bytes(d.beN(4).toInt))
      case 0xc7 => val n = d.beN(1).toInt; decExt(d, n)
      case 0xc8 => val n = d.beN(2).toInt; decExt(d, n)
      case 0xc9 => val n = d.beN(4).toInt; decExt(d, n)
      case 0xca => MpFloat(java.lang.Float.intBitsToFloat(d.beN(4).toInt))
      case 0xcb => MpDouble(java.lang.Double.longBitsToDouble(d.beN(8)))
      case 0xcc => MpInt(d.beN(1))
      case 0xcd => MpInt(d.beN(2))
      case 0xce => MpInt(d.beN(4))
      case 0xcf =>
        val v = d.beN(8)
        if (v >= 0) MpInt(v) else MpUint(v)
      case 0xd0 => MpInt(d.beN(1).toByte.toLong)
      case 0xd1 => MpInt(d.beN(2).toShort.toLong)
      case 0xd2 => MpInt(d.beN(4).toInt.toLong)
      case 0xd3 => MpInt(d.beN(8))
      case 0xd4 => decExt(d, 1)
      case 0xd5 => decExt(d, 2)
      case 0xd6 => decExt(d, 4)
      case 0xd7 => decExt(d, 8)
      case 0xd8 => decExt(d, 16)
      case 0xd9 => decStr(d, d.beN(1).toInt)
      case 0xda => decStr(d, d.beN(2).toInt)
      case 0xdb => decStr(d, d.beN(4).toInt)
      case 0xdc => decArr(d, d.beN(2).toInt, depth)
      case 0xdd => decArr(d, d.beN(4).toInt, depth)
      case 0xde => decMap(d, d.beN(2).toInt, depth)
      case 0xdf => decMap(d, d.beN(4).toInt, depth)
      case _ => d.fail() // 0xc1: never used per spec
    }
  }

  private def decStr(d: Dec, n: Int): MpStr = {
    d.spend(n.toLong)
    val raw = d.bytes(n)
    // strict UTF-8: a malformed string is a malformed document
    val cs = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    try MpStr(cs.decode(java.nio.ByteBuffer.wrap(raw)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => d.fail() }
  }

  private def decExt(d: Dec, n: Int): MpExt = {
    d.spend(n.toLong + 1)
    val t = d.u8().toByte
    MpExt(t, d.bytes(n))
  }

  private def decArr(d: Dec, n: Int, depth: Int): MpArr = {
    d.spend(n.toLong)
    val vs = Seq.newBuilder[Mp]
    var i = 0
    while (i < n) { vs += dec(d, depth + 1); i += 1 }
    MpArr(vs.result())
  }

  private def decMap(d: Dec, n: Int, depth: Int): MpMap = {
    d.spend(2L * n)
    val kvs = Seq.newBuilder[(Mp, Mp)]
    var i = 0
    while (i < n) {
      val k = dec(d, depth + 1)
      val v = dec(d, depth + 1)
      kvs += ((k, v))
      i += 1
    }
    MpMap(kvs.result())
  }
}
