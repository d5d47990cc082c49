package graft.operators

/** Parquet FILE WRITER from scratch (the public parquet-format
  * spec: the Thrift compact footer layout, PageHeader framing,
  * PLAIN encodings and the RLE/bit-packed level hybrid) — the
  * write half of the columnar audit surface: [[ParquetFooter]] /
  * [[ParquetData]] read parquet with no parquet-mr on the path;
  * this emits it, so the engine can round-trip its flagship format
  * from raw bytes in BOTH directions and materialize audit
  * fixtures without any library writer.
  *
  * Scope — the flat shapes audit fixtures and recovery dumps need:
  *  - One row group, one PLAIN data page (v1) per column chunk.
  *  - Physical types BOOLEAN (LSB bit-packed), INT32, INT64,
  *    FLOAT, DOUBLE, BYTE_ARRAY (u32-length-prefixed; `string`
  *    kinds carry the UTF8 converted_type so Spark/DuckDB surface
  *    them as strings).
  *  - OPTIONAL columns: definition levels as the u32-prefixed
  *    RLE hybrid (pure RLE runs at bit width 1); REQUIRED columns
  *    write no level bytes.
  *  - Codecs: UNCOMPRESSED, SNAPPY, GZIP and ZSTD (stored-block
  *    frames via [[Zstd.encodeStore]] — valid zstd, no entropy
  *    coding) — verified on read by four independent readers
  *    (parquet-mr via Spark, DuckDB in the gate, [[ParquetData]],
  *    and the footer walk).
  *
  * The Thrift compact writer emits exactly the field set the spec
  * marks required (plus created_by), with delta field ids and
  * zigzag varints — the same wire layer [[ParquetFooter]]'s reader
  * walks, so a framing slip is caught by our own reader before any
  * external one. Validation: ParquetWriteSpec round-trips through
  * Spark's reader AND [[ParquetData.decodeFile]]; the
  * `parquet_write_roundtrip` gate has Spark's parquet-mr read
  * OUR executor-written shard files under the documents oracle. */
object ParquetWrite {

  /** One flat column: `kind` ∈ boolean/i32/i64/f32/f64/string/
    * binary; one Option per row (None only when `optional`). */
  final case class WCol(name: String, kind: String,
      optional: Boolean, values: IndexedSeq[Option[Any]])

  private def physType(kind: String): Int = kind match {
    case "boolean" => 0
    case "i32" => 1
    case "i64" => 2
    case "f32" => 4
    case "f64" => 5
    case "string" | "binary" => 6
    case k => sys.error(s"unsupported column kind $k")
  }

  // ---------------------------------------------------------------
  // Thrift compact writer (the wire twin of ParquetFooter.TCompact)
  // ---------------------------------------------------------------

  private final class TWriter {
    val out = new java.io.ByteArrayOutputStream(256)
    private var stack: List[Int] = List(0)

    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) {
        out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7
      }
      out.write(v.toInt)
    }
    private def zig(v: Long): Unit = varint((v << 1) ^ (v >> 63))

    def fieldBegin(id: Int, tpe: Int): Unit = {
      val delta = id - stack.head
      if (delta >= 1 && delta <= 15) out.write((delta << 4) | tpe)
      else { out.write(tpe); zig(id.toLong) }
      stack = id :: stack.tail
    }
    def i32(id: Int, v: Long): Unit = { fieldBegin(id, 5); zig(v) }
    def i64(id: Int, v: Long): Unit = { fieldBegin(id, 6); zig(v) }
    def binary(id: Int, b: Array[Byte]): Unit = {
      fieldBegin(id, 8)
      varint(b.length.toLong)
      out.write(b, 0, b.length)
    }
    def str(id: Int, s: String): Unit =
      binary(id, s.getBytes("UTF-8"))
    /** Open a struct FIELD; every struct tracks its own last id. */
    def structBegin(id: Int): Unit = {
      fieldBegin(id, 12)
      stack = 0 :: stack
    }
    def structEnd(): Unit = {
      out.write(0)
      stack = stack.tail
    }
    /** Open a list FIELD of struct elements (or scalars). */
    def listBegin(id: Int, elemType: Int, size: Int): Unit = {
      fieldBegin(id, 9)
      if (size < 15) out.write((size << 4) | elemType)
      else { out.write(0xf0 | elemType); varint(size.toLong) }
    }
    /** A struct LIST ELEMENT (no field header). */
    def elemStructBegin(): Unit = { stack = 0 :: stack }
    def elemStructEnd(): Unit = { out.write(0); stack = stack.tail }
    def stop(): Unit = out.write(0)
    def bytes: Array[Byte] = out.toByteArray
  }

  // ---------------------------------------------------------------
  // Value + level encoders
  // ---------------------------------------------------------------

  private def w32(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 4) { b.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  /** u32-prefixed RLE hybrid at bit width 1: pure RLE runs over the
    * 0/1 definition levels. */
  private def defLevels(present: IndexedSeq[Boolean]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) {
        body.write(((v & 0x7f) | 0x80).toInt); v >>>= 7
      }
      body.write(v.toInt)
    }
    var i = 0
    while (i < present.length) {
      var j = i
      while (j < present.length && present(j) == present(i)) j += 1
      varint(((j - i).toLong << 1)) // RLE run header
      body.write(if (present(i)) 1 else 0)
      i = j
    }
    val out = new java.io.ByteArrayOutputStream()
    val bb = body.toByteArray
    w32(out, bb.length.toLong)
    out.write(bb, 0, bb.length)
    out.toByteArray
  }

  private def plainValues(kind: String, vals: Seq[Any])
      : Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    kind match {
      case "boolean" =>
        var acc = 0
        var n = 0
        vals.foreach { v =>
          if (v.asInstanceOf[Boolean]) acc |= 1 << n
          n += 1
          if (n == 8) { b.write(acc); acc = 0; n = 0 }
        }
        if (n > 0) b.write(acc)
      case "i32" =>
        vals.foreach(v => w32(b, v.asInstanceOf[Int].toLong))
      case "i64" =>
        vals.foreach { v =>
          val l = v.asInstanceOf[Long]
          var i = 0
          while (i < 8) {
            b.write(((l >>> (8 * i)) & 0xff).toInt); i += 1 }
        }
      case "f32" =>
        vals.foreach(v => w32(b,
          java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
            .toLong & 0xffffffffL))
      case "f64" =>
        vals.foreach { v =>
          val l = java.lang.Double
            .doubleToLongBits(v.asInstanceOf[Double])
          var i = 0
          while (i < 8) {
            b.write(((l >>> (8 * i)) & 0xff).toInt); i += 1 }
        }
      case "string" =>
        vals.foreach { v =>
          val s = v.asInstanceOf[String].getBytes("UTF-8")
          w32(b, s.length.toLong); b.write(s, 0, s.length)
        }
      case "binary" =>
        vals.foreach { v =>
          val s = v.asInstanceOf[Array[Byte]]
          w32(b, s.length.toLong); b.write(s, 0, s.length)
        }
      case k => sys.error(s"unsupported column kind $k")
    }
    b.toByteArray
  }

  private def compress(codec: String, raw: Array[Byte])
      : (Int, Array[Byte]) = codec match {
    case "uncompressed" => (0, raw)
    case "snappy" => (1, SnappyCodec.compress(raw))
    case "gzip" =>
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(raw); gz.close()
      (2, bos.toByteArray)
    case "zstd" => // stored-block frames: valid zstd, no entropy
      (6, Zstd.encodeStore(raw))
    case c => sys.error(s"unsupported codec $c")
  }

  // ---------------------------------------------------------------
  // Build
  // ---------------------------------------------------------------

  /** One parquet file: PAR1, one PLAIN v1 data page per column,
    * one row group, Thrift-compact footer, length, PAR1. */
  def build(cols: Seq[WCol], codec: String = "snappy",
      createdBy: String = "graft parquet writer"): Array[Byte] = {
    require(cols.nonEmpty, "no columns")
    val nRows = cols.head.values.length
    require(cols.forall(_.values.length == nRows),
      "ragged column lengths")
    cols.foreach { c =>
      require(c.optional || c.values.forall(_.isDefined),
        s"null in required column ${c.name}")
    }
    val buf = new java.io.ByteArrayOutputStream(4096)
    buf.write('P'); buf.write('A'); buf.write('R'); buf.write('1')

    final case class ChunkMeta(col: WCol, codecId: Int,
        pageOffset: Long, comp: Long, uncomp: Long)
    val chunks = cols.map { c =>
      val present = c.values.map(_.isDefined)
      val levels =
        if (c.optional) defLevels(present) else Array.emptyByteArray
      val vals = plainValues(c.kind, c.values.flatten)
      val raw = levels ++ vals
      val (codecId, body) = compress(codec, raw)
      // PageHeader
      val h = new TWriter
      h.i32(1, 0L) // DATA_PAGE
      h.i32(2, raw.length.toLong)
      h.i32(3, body.length.toLong)
      h.structBegin(5) // DataPageHeader
      h.i32(1, nRows.toLong)
      h.i32(2, 0L) // PLAIN
      h.i32(3, 3L) // def levels: RLE
      h.i32(4, 3L) // rep levels: RLE (none written; max level 0)
      h.structEnd()
      h.stop()
      val hb = h.bytes
      val off = buf.size().toLong
      buf.write(hb, 0, hb.length)
      buf.write(body, 0, body.length)
      ChunkMeta(c, codecId, off,
        hb.length.toLong + body.length, hb.length.toLong + raw.length)
    }

    // footer
    val f = new TWriter
    f.i32(1, 1L) // version
    f.listBegin(2, 12, cols.length + 1) // schema
    f.elemStructBegin() // root
    f.str(4, "schema")
    f.i32(5, cols.length.toLong) // num_children
    f.elemStructEnd()
    cols.foreach { c =>
      f.elemStructBegin()
      f.i32(1, physType(c.kind).toLong)
      f.i32(3, if (c.optional) 1L else 0L) // repetition
      f.str(4, c.name)
      if (c.kind == "string") f.i32(6, 0L) // converted_type UTF8
      f.elemStructEnd()
    }
    f.i64(3, nRows.toLong)
    f.listBegin(4, 12, 1) // row_groups
    f.elemStructBegin()
    f.listBegin(1, 12, chunks.length) // columns
    chunks.foreach { cm =>
      f.elemStructBegin() // ColumnChunk
      f.i64(2, cm.pageOffset) // file_offset
      f.structBegin(3) // ColumnMetaData
      f.i32(1, physType(cm.col.kind).toLong)
      f.listBegin(2, 5, 1) // encodings
      f.varint(0L << 1) // zigzag(PLAIN = 0)
      f.listBegin(3, 8, 1) // path_in_schema
      val nb = cm.col.name.getBytes("UTF-8")
      f.varint(nb.length.toLong); f.out.write(nb, 0, nb.length)
      f.i32(4, cm.codecId.toLong)
      f.i64(5, nRows.toLong)
      f.i64(6, cm.uncomp)
      f.i64(7, cm.comp)
      f.i64(9, cm.pageOffset) // data_page_offset
      f.structEnd()
      f.elemStructEnd()
    }
    f.i64(2, chunks.map(_.comp).sum) // total_byte_size
    f.i64(3, nRows.toLong)
    f.elemStructEnd()
    f.str(6, createdBy)
    f.stop()
    val fb = f.bytes
    buf.write(fb, 0, fb.length)
    w32(buf, fb.length.toLong)
    buf.write('P'); buf.write('A'); buf.write('R'); buf.write('1')
    buf.toByteArray
  }
}
