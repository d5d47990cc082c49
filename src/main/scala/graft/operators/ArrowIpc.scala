package graft.operators

/** Apache Arrow IPC (the public Arrow columnar format + IPC
  * specification: Message.fbs / Schema.fbs, "Encapsulated message
  * format" and "IPC File Format") — the interchange format modern
  * ML dataset tooling ships (HuggingFace `datasets` stores corpora
  * as Arrow files; Feather v2 IS this format). Pure-JVM READER for
  * both the stream format and the file format (`ARROW1` magic), built
  * on a from-scratch MINIMAL FLATBUFFER WALKER (root offset, vtables,
  * scalar fields, offset fields, vectors, strings, structs) — no
  * generated code, no flatbuffers runtime; the field slots below are
  * the public .fbs declaration orders.
  *
  * Column-type subset — the tabular shard shape an ingest engine
  * routes (same policy cut as [[Avro]]): Bool, Int 8/16/32/64
  * signed/unsigned, Float32/64, Utf8, Binary, each nullable via the
  * validity bitmap (LSB bit order per spec). Nested types (List/
  * Struct/Map/Union), dictionary encoding, body compression and big-
  * endian streams REJECT cleanly (None) — drop, never invent. Every
  * structural invariant is checked: continuation marker, 8-byte
  * alignment, bodyLength bounds, node/buffer counts against the
  * schema's buffer layout, offsets monotonicity, null-count
  * consistency, trailing file magic.
  *
  * No reference analogue (north-star ingestion surface); validated
  * in ArrowIpcSpec by differentials against the arrow-java 18.3
  * implementation Spark bundles (their ArrowFileWriter /
  * ArrowStreamWriter → our reader across types, nulls, multiple
  * batches) and fuzz; the `arrow_ipc_parse` gate query reads REAL
  * arrow-java files built from the documents table. */
object ArrowIpc {

  /** Arrow FILE format sniff ("ARROW1\0\0"). */
  def isArrowFile(b: Array[Byte]): Boolean =
    b.length >= 8 && b(0) == 'A' && b(1) == 'R' && b(2) == 'R' &&
      b(3) == 'O' && b(4) == 'W' && b(5) == '1' && b(6) == 0 && b(7) == 0

  // ---------------------------------------------------------------
  // Minimal flatbuffer walker
  // ---------------------------------------------------------------

  private final class Fb(val b: Array[Byte], val base: Int, val end: Int) {
    def ok(pos: Int, n: Int): Boolean = pos >= base && pos + n <= end
    def u8(pos: Int): Int = b(pos) & 0xff
    def i16(pos: Int): Int = (u8(pos) | (u8(pos + 1) << 8)).toShort.toInt
    def u16(pos: Int): Int = u8(pos) | (u8(pos + 1) << 8)
    def i32(pos: Int): Int =
      u8(pos) | (u8(pos + 1) << 8) | (u8(pos + 2) << 16) | (u8(pos + 3) << 24)
    def i64(pos: Int): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (b(pos + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    /** Root table position, or -1. */
    def root(): Int = {
      if (!ok(base, 4)) return -1
      val t = base + i32(base)
      if (ok(t, 4)) t else -1
    }
    /** Absolute position of field `slot` (declaration index) in the
      * table at `t`, or -1 when absent. */
    def field(t: Int, slot: Int): Int = {
      if (!ok(t, 4)) return -1
      val vt = t - i32(t)
      if (!ok(vt, 4)) return -1
      val vtSize = u16(vt)
      val off = 4 + 2 * slot
      if (off + 2 > vtSize || !ok(vt + off, 2)) return -1
      val fo = u16(vt + off)
      if (fo == 0) -1 else t + fo
    }
    def fieldI16(t: Int, slot: Int, dflt: Int): Int = {
      val p = field(t, slot)
      if (p < 0 || !ok(p, 2)) dflt else i16(p)
    }
    def fieldU8(t: Int, slot: Int, dflt: Int): Int = {
      val p = field(t, slot)
      if (p < 0 || !ok(p, 1)) dflt else u8(p)
    }
    def fieldI32(t: Int, slot: Int, dflt: Int): Int = {
      val p = field(t, slot)
      if (p < 0 || !ok(p, 4)) dflt else i32(p)
    }
    def fieldI64(t: Int, slot: Int, dflt: Long): Long = {
      val p = field(t, slot)
      if (p < 0 || !ok(p, 8)) dflt else i64(p)
    }
    def fieldBool(t: Int, slot: Int, dflt: Boolean): Boolean = {
      val p = field(t, slot)
      if (p < 0 || !ok(p, 1)) dflt else u8(p) != 0
    }
    /** Follow an offset field to a table/vector/string position. */
    def fieldRef(t: Int, slot: Int): Int = {
      val p = field(t, slot)
      if (p < 0 || !ok(p, 4)) return -1
      val q = p + i32(p)
      if (ok(q, 4)) q else -1
    }
    def vecLen(vpos: Int): Int = if (vpos < 0 || !ok(vpos, 4)) -1 else i32(vpos)
    /** Element ref inside a vector of offsets. */
    def vecRef(vpos: Int, i: Int): Int = {
      val p = vpos + 4 + 4 * i
      if (!ok(p, 4)) return -1
      val q = p + i32(p)
      if (ok(q, 4)) q else -1
    }
    /** Struct element position inside a vector of fixed-size structs. */
    def vecStruct(vpos: Int, i: Int, size: Int): Int = {
      val p = vpos + 4 + size * i
      if (ok(p, size)) p else -1
    }
    def str(spos: Int): Option[String] = {
      if (spos < 0 || !ok(spos, 4)) return None
      val n = i32(spos)
      if (n < 0 || !ok(spos + 4, n)) return None
      Some(new String(b, spos + 4, n, "UTF-8"))
    }
  }

  // ---------------------------------------------------------------
  // Schema model (the supported subset)
  // ---------------------------------------------------------------

  /** One column: Arrow type folded to a tag — "bool", "int8/16/32/64",
    * "uint8/16/32/64", "float32/64", "utf8", "binary". */
  final case class Col(name: String, nullable: Boolean, tag: String)

  /** Decoded value row: None = null (the [[Avro.Row]] convention). */
  type Row = Seq[Option[Any]]

  private def parseSchema(fb: Fb, t: Int): Option[Seq[Col]] = {
    // Schema { endianness(0), fields(1), ... } — big-endian rejects
    if (fb.fieldI16(t, 0, 0) != 0) return None
    val fv = fb.fieldRef(t, 1)
    val n = fb.vecLen(fv)
    if (n < 0 || n > 4096) return None
    val cols = Seq.newBuilder[Col]
    var i = 0
    while (i < n) {
      val ft = fb.vecRef(fv, i)
      if (ft < 0) return None
      // Field { name(0), nullable(1), type_type(2), type(3),
      //         dictionary(4), children(5) }
      val name = fb.str(fb.fieldRef(ft, 0)).getOrElse(return None)
      val nullable = fb.fieldBool(ft, 1, dflt = false)
      if (fb.field(ft, 4) >= 0) return None // dictionary-encoded
      val kids = fb.fieldRef(ft, 5)
      if (kids >= 0 && fb.vecLen(kids) > 0) return None // nested
      val typeType = fb.fieldU8(ft, 2, 0)
      val tt = fb.fieldRef(ft, 3)
      val tag = typeType match {
        case 2 => // Int { bitWidth(0), is_signed(1) }
          val bits = fb.fieldI32(tt, 0, 0)
          val signed = fb.fieldBool(tt, 1, dflt = false)
          if (!Set(8, 16, 32, 64)(bits)) return None
          (if (signed) "int" else "uint") + bits
        case 3 => // FloatingPoint { precision(0) }: 1=single 2=double
          fb.fieldI16(tt, 0, 0) match {
            case 1 => "float32"
            case 2 => "float64"
            case _ => return None // half
          }
        case 4 => "binary"
        case 5 => "utf8"
        case 6 => "bool"
        case _ => return None // Null/nested/decimal/temporal/...
      }
      cols += Col(name, nullable, tag)
      i += 1
    }
    Some(cols.result())
  }

  // ---------------------------------------------------------------
  // Encapsulated messages
  // ---------------------------------------------------------------

  /** Parse the stream-format message sequence at [off, end):
    * schema message, then record batches until EOS/stream end.
    * Returns (columns, rows, bytesConsumed). */
  private def parseMessages(b: Array[Byte], off: Int, end: Int,
      maxRows: Int): Option[(Seq[Col], Seq[Row], Int)] = {
    var p = off
    var cols: Seq[Col] = null
    val rows = Seq.newBuilder[Row]
    var total = 0L
    var done = false
    while (!done) {
      if (p + 8 > end) {
        // stream may simply end after the last batch (no EOS)
        done = true
      } else {
        val cont = le32(b, p)
        if (cont != 0xffffffffL) {
          // legacy pre-continuation encoding is not supported; but a
          // 0 word here is the EOS of old streams
          if (cont == 0) { p += 4; done = true } else return None
        } else {
          val metaLen = le32(b, p + 4).toInt
          if (metaLen == 0) { p += 8; done = true }
          else {
            if (metaLen < 0 || p + 8 + metaLen > end) return None
            val fb = new Fb(b, p + 8, p + 8 + metaLen)
            val msg = fb.root()
            if (msg < 0) return None
            // Message { version(0), header_type(1), header(2),
            //           bodyLength(3) }
            val headerType = fb.fieldU8(msg, 1, 0)
            val header = fb.fieldRef(msg, 2)
            val bodyLen = fb.fieldI64(msg, 3, 0L)
            var q = p + 8 + metaLen
            q = ((q + 7) / 8) * 8 // body is 8-byte aligned
            if (bodyLen < 0 || q + bodyLen > end) return None
            headerType match {
              case 1 => // Schema
                if (cols != null) return None
                cols = parseSchema(fb, header).getOrElse(return None)
              case 3 => // RecordBatch
                if (cols == null) return None
                val got = parseBatch(fb, header, b, q, bodyLen, cols)
                  .getOrElse(return None)
                total += got.length
                if (total > maxRows) return None
                rows ++= got
              case _ => return None // DictionaryBatch/Tensor/...
            }
            p = (q + bodyLen).toInt
            p = ((p + 7) / 8) * 8
            if (p > end) return None
          }
        }
      }
    }
    if (cols == null) None else Some((cols, rows.result(), p - off))
  }

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Decode one RecordBatch body into rows. */
  private def parseBatch(fb: Fb, t: Int, body: Array[Byte],
      bodyOff: Int, bodyLen: Long, cols: Seq[Col]): Option[Seq[Row]] = {
    // RecordBatch { length(0), nodes(1), buffers(2), compression(3) }
    if (fb.field(t, 3) >= 0) return None // body compression
    val n = fb.fieldI64(t, 0, -1L)
    if (n < 0 || n > (1L << 24)) return None
    val nodesV = fb.fieldRef(t, 1)
    val bufsV = fb.fieldRef(t, 2)
    val nNodes = fb.vecLen(nodesV)
    val nBufs = fb.vecLen(bufsV)
    if (nNodes != cols.length) return None
    // per column: validity + (offsets for var-width) + data
    val wantBufs = cols.map(c =>
      if (c.tag == "utf8" || c.tag == "binary") 3 else 2).sum
    if (nBufs != wantBufs) return None
    val rows = Array.fill(n.toInt)(Seq.newBuilder[Option[Any]])
    var bi = 0
    var ci = 0
    while (ci < cols.length) {
      val c = cols(ci)
      val node = fb.vecStruct(nodesV, ci, 16)
      if (node < 0) return None
      val nodeLen = fb.i64(node)
      val nullCount = fb.i64(node + 8)
      if (nodeLen != n || nullCount < 0 || nullCount > n) return None
      def buffer(idx: Int): Option[(Long, Long)] = {
        val s = fb.vecStruct(bufsV, idx, 16)
        if (s < 0) return None
        val off = fb.i64(s)
        val len = fb.i64(s + 8)
        if (off < 0 || len < 0 || off + len > bodyLen) None
        else Some((off, len))
      }
      val (vOff, vLen) = buffer(bi).getOrElse(return None)
      def isValid(i: Int): Boolean = {
        if (nullCount == 0 || vLen == 0) true
        else {
          val byteI = bodyOff + vOff.toInt + (i >> 3)
          ((body(byteI) >>> (i & 7)) & 1) != 0
        }
      }
      if (nullCount > 0 && vLen < (n + 7) / 8) return None
      if (c.tag == "utf8" || c.tag == "binary") {
        val (oOff, oLen) = buffer(bi + 1).getOrElse(return None)
        val (dOff, dLen) = buffer(bi + 2).getOrElse(return None)
        if (oLen < 4L * (n + 1)) return None
        var i = 0
        var prev = 0L
        while (i < n) {
          val s = le32(body, bodyOff + oOff.toInt + 4 * i)
          val e = le32(body, bodyOff + oOff.toInt + 4 * (i + 1))
          if (s < prev || e < s || e > dLen) return None
          prev = s
          if (isValid(i)) {
            val bytes = java.util.Arrays.copyOfRange(body,
              bodyOff + dOff.toInt + s.toInt,
              bodyOff + dOff.toInt + e.toInt)
            rows(i) += (if (c.tag == "utf8")
              Some(new String(bytes, "UTF-8")) else Some(bytes))
          } else rows(i) += None
          i += 1
        }
        bi += 3
      } else {
        val (dOff, dLen) = buffer(bi + 1).getOrElse(return None)
        val width = c.tag match {
          case "bool" => 0 // bitmap
          case "int8" | "uint8" => 1
          case "int16" | "uint16" => 2
          case "int32" | "uint32" | "float32" => 4
          case _ => 8
        }
        if (width == 0) { if (dLen < (n + 7) / 8) return None }
        else if (dLen < width.toLong * n) return None
        var i = 0
        while (i < n) {
          if (!isValid(i)) rows(i) += None
          else {
            val base = bodyOff + dOff.toInt
            val v: Any = c.tag match {
              case "bool" =>
                ((body(base + (i >> 3)) >>> (i & 7)) & 1) != 0
              case "int8"  => body(base + i)
              case "uint8" => (body(base + i) & 0xff).toShort
              case "int16" => fbI16(body, base + 2 * i)
              case "uint16" => (fbI16(body, base + 2 * i) & 0xffff)
              case "int32" => fbI32(body, base + 4 * i)
              case "uint32" => fbI32(body, base + 4 * i) & 0xffffffffL
              case "int64" | "uint64" => fbI64(body, base + 8 * i)
              case "float32" =>
                java.lang.Float.intBitsToFloat(fbI32(body, base + 4 * i))
              case _ =>
                java.lang.Double.longBitsToDouble(fbI64(body, base + 8 * i))
            }
            rows(i) += Some(v)
          }
          i += 1
        }
        bi += 2
      }
      ci += 1
    }
    Some(rows.toSeq.map(_.result()))
  }

  private def fbI16(b: Array[Byte], o: Int): Short =
    ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)).toShort
  private def fbI32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)
  private def fbI64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (b(o + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  // ---------------------------------------------------------------
  // Entry points
  // ---------------------------------------------------------------

  /** Read an Arrow STREAM (no file magic): schema + batches. */
  def parseStream(data: Array[Byte], maxRows: Int = 1 << 24)
      : Option[(Seq[Col], Seq[Row])] =
    try parseMessages(data, 0, data.length, maxRows).map(r => (r._1, r._2))
    catch { case _: ArrayIndexOutOfBoundsException => None }

  /** Read an Arrow FILE (`ARROW1` magic both ends): the embedded
    * stream is walked sequentially; the trailing magic is verified.
    * (The footer flatbuffer is redundant with the stream walk for
    * sequential reads — offsets are only needed for random access.) */
  def parseFile(data: Array[Byte], maxRows: Int = 1 << 24)
      : Option[(Seq[Col], Seq[Row])] = {
    if (!isArrowFile(data) || data.length < 8 + 6) return None
    val tail = data.length - 6
    if (!(data(tail) == 'A' && data(tail + 1) == 'R' &&
      data(tail + 2) == 'R' && data(tail + 3) == 'O' &&
      data(tail + 4) == 'W' && data(tail + 5) == '1')) return None
    try parseMessages(data, 8, tail, maxRows).map(r => (r._1, r._2))
    catch { case _: ArrayIndexOutOfBoundsException => None }
  }
}
