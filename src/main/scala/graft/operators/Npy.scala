package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** NumPy `.npy` (the public NEP 1 / numpy.lib.format spec) and
  * `.npz` (a ZIP of `.npy` members) — the formats scientific and ML
  * pipelines dump arrays in; embedding matrices, token-id vectors
  * and label arrays routinely arrive as `.npy`/`.npz` shards. Both
  * directions, pure-JVM:
  *
  *  - [[build]] writes format version 1.0 (2.0 automatically when
  *    the header exceeds the u16 bound): `\\x93NUMPY`, version,
  *    header length, then the Python-dict-literal header
  *    `{'descr': '<f4', 'fortran_order': False, 'shape': (3, 4), }`
  *    space-padded so the data start is 64-aligned (the spec's
  *    alignment recommendation), `\\n`-terminated, then the raw
  *    array body. C (row-major) order.
  *  - [[parse]] reads versions 1.0/2.0/3.0, BOTH byte orders
  *    (`<`/`>`; `|` for single-byte types, `=` rejected as
  *    writer-dependent), BOTH memory orders (`fortran_order: True`
  *    handled by the index mapping in [[Arr.at]]), and the numeric
  *    dtype table below. Object arrays (`descr` containing 'O'),
  *    pickled payloads, structured dtypes and string dtypes
  *    reject — they embed arbitrary pickle, which an analytics
  *    engine must never execute.
  *
  * The header dict is parsed by a tiny recursive reader for the
  * exact literal grammar numpy emits (quoted strings, True/False,
  * int tuples incl. the 1-elem `(n,)` form, trailing commas).
  * Validation: magic/version/length bounds, header must be ASCII,
  * `shape`·itemsize must equal the body length exactly (trailing
  * bytes reject), element count capped at 2^31. None on any
  * malformation — drop, never invent. No JVM numpy exists to
  * differential against; validation is hand-pinned layouts from the
  * spec document, round trips across dtypes × orders × versions,
  * and mutation fuzz — NpySpec. `.npz` composes the verified
  * [[Zip]] walk: STORED or DEFLATE members, each a well-formed
  * `.npy`, surfaced by member name with the `.npy` suffix dropped
  * (numpy's own convention). */
object Npy {

  /** A parsed array: dtype tag (`descr` with the order mark
    * stripped, e.g. "f4"), big-endian flag, fortran flag, dims, and
    * the raw body bytes in file order. [[Arr.at]] indexes in
    * LOGICAL row-major coordinates regardless of memory order. */
  final case class Arr(descr: String, bigEndian: Boolean,
      fortran: Boolean, shape: Seq[Int], data: Array[Byte]) {

    def elems: Long = shape.foldLeft(1L)(_ * _.toLong)
    def itemSize: Int = ItemSize(descr)

    private def order =
      if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN

    /** Flat offset of logical row-major index `ix` honouring the
      * memory order. */
    private def flat(ix: Seq[Int]): Int = {
      require(ix.length == shape.length, "rank mismatch")
      ix.zip(shape).foreach { case (i, d) =>
        require(i >= 0 && i < d, s"index $i out of [0,$d)") }
      if (fortran) {
        // first axis varies fastest
        var off = 0L; var stride = 1L
        ix.zip(shape).foreach { case (i, d) =>
          off += i * stride; stride *= d }
        off.toInt
      } else {
        // last axis varies fastest
        var off = 0L
        ix.zip(shape).foreach { case (i, d) => off = off * d + i }
        off.toInt
      }
    }

    /** Element at logical index as Double (integers widen; bool →
      * 0/1; f2 via the shared half-float arithmetic). */
    def at(ix: Int*): Double = {
      val i = flat(ix)
      val b = ByteBuffer.wrap(data).order(order)
      descr match {
        case "b1" => if (data(i) != 0) 1.0 else 0.0
        case "i1" => data(i).toDouble
        case "u1" => (data(i) & 0xff).toDouble
        case "i2" => b.getShort(i * 2).toDouble
        case "u2" => (b.getShort(i * 2) & 0xffff).toDouble
        case "i4" => b.getInt(i * 4).toDouble
        case "u4" => (b.getInt(i * 4).toLong & 0xffffffffL).toDouble
        case "i8" => b.getLong(i * 8).toDouble
        case "u8" => b.getLong(i * 8).toDouble // raw bits as signed
        case "f2" =>
          Safetensors.halfToFloat(b.getShort(i * 2) & 0xffff).toDouble
        case "f4" => b.getFloat(i * 4).toDouble
        case "f8" => b.getDouble(i * 8)
        case d => sys.error(s"unhandled descr $d")
      }
    }

    /** i8/u8 element at logical index as an exact Long. */
    def longAt(ix: Int*): Long = {
      require(descr == "i8" || descr == "u8", s"longAt on $descr")
      ByteBuffer.wrap(data).order(order).getLong(flat(ix) * 8)
    }

    def floatAt(ix: Int*): Float = {
      require(descr == "f4", s"floatAt on $descr")
      ByteBuffer.wrap(data).order(order).getFloat(flat(ix) * 4)
    }
  }

  val ItemSize: Map[String, Int] = Map(
    "b1" -> 1, "i1" -> 1, "u1" -> 1,
    "i2" -> 2, "u2" -> 2, "f2" -> 2,
    "i4" -> 4, "u4" -> 4, "f4" -> 4,
    "i8" -> 8, "u8" -> 8, "f8" -> 8)

  private final val Magic = "NUMPY".getBytes("ISO-8859-1")
  private final val MaxElems = Int.MaxValue.toLong
  private final val MaxHeader = 1 << 22 // 4 MiB of dict literal

  // ---------------------------------------------------------------
  // Build (v1.0 when possible, C order, little-endian)
  // ---------------------------------------------------------------

  /** `data` must already be laid out in the declared memory order
    * and byte order — [[buildF4]]/[[buildI8]] handle the common
    * C-order little-endian case. */
  def build(descr: String, shape: Seq[Int], data: Array[Byte],
      fortran: Boolean = false, bigEndian: Boolean = false)
      : Array[Byte] = {
    val isz = ItemSize.getOrElse(descr, sys.error(s"dtype $descr"))
    require(shape.forall(_ >= 0), "negative dim")
    val elems = shape.foldLeft(1L)(_ * _.toLong)
    require(elems <= MaxElems, "too many elements")
    require(data.length.toLong == elems * isz,
      s"${data.length} bytes for $elems elems of $descr")
    val mark = if (isz == 1) "|" else if (bigEndian) ">" else "<"
    val shapeTxt = shape match {
      case Seq() => "()"
      case Seq(d) => s"($d,)"
      case ds => ds.mkString("(", ", ", ")")
    }
    val dict = s"{'descr': '$mark$descr', 'fortran_order': " +
      s"${if (fortran) "True" else "False"}, 'shape': $shapeTxt, }"
    val d = dict.getBytes("ASCII")
    // pad with spaces + final \n so (magic+version+len+header) % 64 == 0
    def padded(prefix: Int): Array[Byte] = {
      val raw = prefix + d.length + 1
      val pad = (64 - (raw % 64)) % 64
      d ++ Array.fill(pad)(' '.toByte) :+ '\n'.toByte
    }
    val out = new java.io.ByteArrayOutputStream(
      128 + d.length + data.length)
    out.write(Magic)
    val h1 = padded(10)
    if (h1.length <= 0xffff) {
      out.write(1); out.write(0)
      out.write(h1.length & 0xff); out.write((h1.length >> 8) & 0xff)
      out.write(h1)
    } else {
      val h2 = padded(12)
      out.write(2); out.write(0)
      var i = 0
      while (i < 4) { out.write((h2.length >> (8 * i)) & 0xff); i += 1 }
      out.write(h2)
    }
    out.write(data)
    out.toByteArray
  }

  /** Floats → a C-order little-endian f4 `.npy`. */
  def buildF4(shape: Seq[Int], xs: Array[Float]): Array[Byte] = {
    val b = ByteBuffer.allocate(xs.length * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    xs.foreach(b.putFloat)
    build("f4", shape, b.array())
  }

  /** Longs → a C-order little-endian i8 `.npy`. */
  def buildI8(shape: Seq[Int], xs: Array[Long]): Array[Byte] = {
    val b = ByteBuffer.allocate(xs.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    xs.foreach(b.putLong)
    build("i8", shape, b.array())
  }

  // ---------------------------------------------------------------
  // Parse
  // ---------------------------------------------------------------

  def parse(bytes: Array[Byte]): Option[Arr] = {
    if (bytes.length < 10) return None
    var i = 0
    while (i < 6) {
      if (bytes(i) != Magic(i)) return None
      i += 1
    }
    val major = bytes(6) & 0xff
    val minor = bytes(7) & 0xff
    if (major < 1 || major > 3 || minor != 0) return None
    val (hlen, hoff) =
      if (major == 1) (((bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)).toLong, 10)
      else {
        if (bytes.length < 12) return None
        var v = 0L
        var j = 0
        while (j < 4) { v |= (bytes(8 + j).toLong & 0xff) << (8 * j); j += 1 }
        (v, 12)
      }
    if (hlen <= 0 || hlen > MaxHeader ||
      hoff + hlen > bytes.length) return None
    // spec: header is the dict, space padding, terminated by \n
    if (bytes(hoff + hlen.toInt - 1) != '\n') return None
    val header = new String(bytes, hoff, hlen.toInt, "ASCII")
    val (descrRaw, fortran, shape) = parseDict(header.trim)
      .getOrElse(return None)
    if (descrRaw.length < 2) return None
    val mark = descrRaw.head
    val descr = descrRaw.tail
    val isz = ItemSize.getOrElse(descr, return None)
    val big = mark match {
      case '<' => false
      case '>' => true
      case '|' if isz == 1 => false
      case _ => return None
    }
    if (shape.exists(_ < 0)) return None
    var elems = 1L
    shape.foreach { d =>
      elems *= d
      if (elems > MaxElems) return None
    }
    val body = bytes.length - hoff - hlen
    if (body != elems * isz) return None // trailing bytes reject
    Some(Arr(descr, big, fortran, shape,
      java.util.Arrays.copyOfRange(bytes, hoff + hlen.toInt,
        bytes.length)))
  }

  /** The exact dict-literal grammar numpy emits:
    * {'descr': '<f4', 'fortran_order': False, 'shape': (2, 3), }
    * Key order is free; unknown keys reject (structured dtypes
    * arrive as a list under 'descr' and fail the quote scan). */
  private def parseDict(s: String)
      : Option[(String, Boolean, Seq[Int])] = {
    var p = 0
    def ws(): Unit = while (p < s.length && s(p) == ' ') p += 1
    def eat(c: Char): Boolean = {
      ws()
      if (p < s.length && s(p) == c) { p += 1; true } else false
    }
    def quoted(): Option[String] = {
      ws()
      if (p >= s.length || (s(p) != '\'' && s(p) != '"')) return None
      val q = s(p); p += 1
      val st = p
      while (p < s.length && s(p) != q) p += 1
      if (p >= s.length) return None
      val r = s.substring(st, p); p += 1
      Some(r)
    }
    if (!eat('{')) return None
    var descr: Option[String] = None
    var fortran: Option[Boolean] = None
    var shape: Option[Seq[Int]] = None
    var more = true
    while (more) {
      ws()
      if (p < s.length && s(p) == '}') { p += 1; more = false }
      else {
        val k = quoted().getOrElse(return None)
        if (!eat(':')) return None
        k match {
          case "descr" =>
            descr = Some(quoted().getOrElse(return None))
          case "fortran_order" =>
            ws()
            if (s.startsWith("True", p)) { fortran = Some(true); p += 4 }
            else if (s.startsWith("False", p)) {
              fortran = Some(false); p += 5 }
            else return None
          case "shape" =>
            if (!eat('(')) return None
            val dims = Seq.newBuilder[Int]
            var inTuple = true
            while (inTuple) {
              ws()
              if (p < s.length && s(p) == ')') { p += 1; inTuple = false }
              else {
                val st = p
                while (p < s.length && s(p).isDigit) p += 1
                if (p == st) return None
                val d = try s.substring(st, p).toInt
                  catch { case _: NumberFormatException => return None }
                dims += d
                ws()
                if (p < s.length && s(p) == ',') p += 1
                else { ws(); if (p >= s.length || s(p) != ')')
                  return None }
              }
            }
            shape = Some(dims.result())
          case _ => return None
        }
        if (!eat(',')) { ws()
          if (p >= s.length || s(p) != '}') return None }
      }
    }
    ws()
    if (p != s.length) return None
    for (d <- descr; f <- fortran; sh <- shape) yield (d, f, sh)
  }

  // ---------------------------------------------------------------
  // .npz — a ZIP of .npy members
  // ---------------------------------------------------------------

  /** Member name (``.npy`` suffix dropped, numpy's convention) →
    * parsed array. None if the ZIP walk fails, any member is not a
    * well-formed `.npy`, or names collide after suffix-stripping. */
  def parseNpz(bytes: Array[Byte]): Option[Seq[(String, Arr)]] = {
    val members =
      try Zip.parseWithData(bytes)
      catch { case _: Exception => return None }
    if (members.isEmpty) return None
    val out = members.map { case (e, data) =>
      val name =
        if (e.name.endsWith(".npy")) e.name.dropRight(4) else e.name
      (name, parse(data).getOrElse(return None))
    }
    if (out.map(_._1).distinct.length != out.length) return None
    Some(out)
  }

  /** Arrays → an `.npz`: STORED members (numpy's `np.savez`) or
    * DEFLATE members (`np.savez_compressed`). */
  def buildNpz(arrays: Seq[(String, Array[Byte])],
      deflate: Boolean = false): Array[Byte] =
    Zip.buildArchive(arrays.map { case (n, npy) =>
      (s"$n.npy", npy, deflate) })
}
