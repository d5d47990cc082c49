package graft.operators

/** ORC FILE WRITER from scratch (the public ORCv1 specification:
  * postscript/footer/stripe-footer protobuf layouts, the chunked
  * compression framing, byte-RLE and integer RLEv1) — the write
  * half of [[OrcTail]]/[[OrcData]]'s audit surface, mirroring
  * [[ParquetWrite]] for the other columnar format so both
  * flagship formats round-trip from raw bytes in BOTH directions.
  *
  * Scope — flat columns, the shapes audit fixtures need:
  *  - Kinds boolean/int/long/float/double/string/binary (ORC type
  *    kinds 0/3/4/5/6/7/8) under the root struct.
  *  - OPTIONAL columns via PRESENT streams (byte-RLE over
  *    MSB-first bitmaps); booleans the same way.
  *  - Integers and string LENGTH runs as RLEv1 literal groups
  *    (encoding DIRECT — every ORC reader accepts v1), floats raw
  *    LE, strings/binary as DIRECT data+length.
  *  - Codecs NONE, ZLIB (raw deflate), SNAPPY and ZSTD
  *    (stored-block frames) inside the spec's 3-byte chunk
  *    headers, sections split at the block size.
  *  - Multi-stripe output via `rowsPerStripe` — stripes are the
  *    spec's parallel-scan unit, so fixtures can exercise stripe
  *    concatenation on read.
  *
  * Everything is emitted through the repo's own [[Protobuf]] wire
  * helpers; no orc-core on the write path. Validation:
  * OrcWriteSpec round-trips through Spark's ORC reader AND
  * [[OrcData.decodeFile]] across kinds, nulls, codecs and stripe
  * splits; the `orc_write_roundtrip` gate has Spark read OUR
  * executor-written shards under the documents oracle. */
object OrcWrite {

  /** One flat column; `kind` ∈ boolean/i32/i64/f32/f64/string/
    * binary. */
  final case class WCol(name: String, kind: String,
      optional: Boolean, values: IndexedSeq[Option[Any]])

  private def orcKind(kind: String): Int = kind match {
    case "boolean" => 0
    case "i32" => 3
    case "i64" => 4
    case "f32" => 5
    case "f64" => 6
    case "string" => 7
    case "binary" => 8
    case k => sys.error(s"unsupported column kind $k")
  }

  // ---------------------------------------------------------------
  // Run-length encoders (writer twins of OrcData's decoders)
  // ---------------------------------------------------------------

  /** Byte-RLE literal groups (header 256-n + n bytes). */
  private def byteRle(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length + 8)
    var i = 0
    while (i < bytes.length) {
      val n = math.min(128, bytes.length - i)
      out.write(256 - n)
      out.write(bytes, i, n)
      i += n
    }
    out.toByteArray
  }

  /** MSB-first bitmap of booleans, byte-RLE framed. */
  private def boolStream(bits: Seq[Boolean]): Array[Byte] = {
    val bytes = new Array[Byte]((bits.length + 7) / 8)
    bits.zipWithIndex.foreach { case (b, i) =>
      if (b) bytes(i >> 3) = (bytes(i >> 3) |
        (1 << (7 - (i & 7)))).toByte
    }
    byteRle(bytes)
  }

  /** Integer RLEv1 literal groups (header 256-n + n varints,
    * zigzag when signed). */
  private def intRleV1(vals: Seq[Long], signed: Boolean)
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(vals.length + 8)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) {
        out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7
      }
      out.write(v.toInt)
    }
    var i = 0
    while (i < vals.length) {
      val n = math.min(128, vals.length - i)
      out.write(256 - n)
      var j = 0
      while (j < n) {
        val v = vals(i + j)
        varint(if (signed) (v << 1) ^ (v >> 63) else v)
        j += 1
      }
      i += n
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Compression framing
  // ---------------------------------------------------------------

  private final val BlockSize = 256 * 1024

  /** A compressed section: 3-byte LE chunk headers, raw deflate
    * bodies (or the isOriginal escape when deflate grows). */
  private def section(codec: Int, raw: Array[Byte]): Array[Byte] = {
    if (codec == 0 || raw.isEmpty) return raw
    val out = new java.io.ByteArrayOutputStream(raw.length + 16)
    var i = 0
    while (i < raw.length) {
      val n = math.min(BlockSize, raw.length - i)
      val chunk = java.util.Arrays.copyOfRange(raw, i, i + n)
      val cb = codec match {
        case 1 =>
          val defl = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          defl.setInput(chunk); defl.finish()
          val comp = new java.io.ByteArrayOutputStream(n / 2 + 64)
          val tmp = new Array[Byte](8192)
          while (!defl.finished())
            comp.write(tmp, 0, defl.deflate(tmp))
          defl.end()
          comp.toByteArray
        case 2 => SnappyCodec.compress(chunk)
        case 5 => Zstd.encodeStore(chunk)
        case other => sys.error(s"unsupported orc codec $other")
      }
      val (body, original) =
        if (cb.length < n) (cb, false) else (chunk, true)
      val h = (body.length << 1) | (if (original) 1 else 0)
      out.write(h & 0xff)
      out.write((h >> 8) & 0xff)
      out.write((h >> 16) & 0xff)
      out.write(body, 0, body.length)
      i += n
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Protobuf messages (orc_proto.proto field numbers)
  // ---------------------------------------------------------------

  import Protobuf.{writeVarint, writeTag, writeLen}

  private def vfield(b: java.io.ByteArrayOutputStream, id: Int,
      v: Long): Unit = { writeTag(b, id, 0); writeVarint(b, v) }
  private def sfield(b: java.io.ByteArrayOutputStream, id: Int,
      s: Array[Byte]): Unit = writeLen(b, id, s)

  // ---------------------------------------------------------------
  // Build
  // ---------------------------------------------------------------

  /** One ORC file. `codec`: "none" | "zlib". */
  def build(cols: Seq[WCol], codec: String = "zlib",
      rowsPerStripe: Int = Int.MaxValue): Array[Byte] = {
    require(cols.nonEmpty, "no columns")
    val nRows = cols.head.values.length
    require(cols.forall(_.values.length == nRows),
      "ragged column lengths")
    cols.foreach { c =>
      require(c.optional || c.values.forall(_.isDefined),
        s"null in required column ${c.name}")
    }
    require(rowsPerStripe > 0, "rowsPerStripe must be positive")
    val codecId = codec match {
      case "none" => 0
      case "zlib" => 1
      case "snappy" => 2
      case "zstd" => 5
      case c => sys.error(s"unsupported codec $c")
    }
    val buf = new java.io.ByteArrayOutputStream(4096)
    buf.write('O'); buf.write('R'); buf.write('C')

    final case class StripeMeta(offset: Long, dataLen: Long,
        footerLen: Long, nRows: Long)
    val ranges =
      if (nRows == 0) Seq.empty[(Int, Int)] // no stripes at all
      else (0 until nRows by math.min(rowsPerStripe, nRows))
        .map(s => (s, math.min(s + rowsPerStripe, nRows)))
    val stripes = ranges.map { case (lo, hi) =>
      val offset = buf.size().toLong
      // (streamKind, column, bytes) in column order
      val streams = Seq.newBuilder[(Int, Int, Array[Byte])]
      cols.zipWithIndex.foreach { case (c, ci) =>
        val col = ci + 1
        val vals = c.values.slice(lo, hi)
        val present = vals.map(_.isDefined)
        if (c.optional)
          streams += ((0, col, section(codecId,
            boolStream(present))))
        val nn = vals.flatten
        c.kind match {
          case "boolean" =>
            streams += ((1, col, section(codecId,
              boolStream(nn.map(_.asInstanceOf[Boolean])))))
          case "i32" =>
            streams += ((1, col, section(codecId, intRleV1(
              nn.map(_.asInstanceOf[Int].toLong), signed = true))))
          case "i64" =>
            streams += ((1, col, section(codecId, intRleV1(
              nn.map(_.asInstanceOf[Long]), signed = true))))
          case "f32" =>
            val b = new java.io.ByteArrayOutputStream(nn.length * 4)
            nn.foreach { v =>
              val bits = java.lang.Float
                .floatToIntBits(v.asInstanceOf[Float])
              var k = 0
              while (k < 4) {
                b.write((bits >>> (8 * k)) & 0xff); k += 1 }
            }
            streams += ((1, col, section(codecId, b.toByteArray)))
          case "f64" =>
            val b = new java.io.ByteArrayOutputStream(nn.length * 8)
            nn.foreach { v =>
              val bits = java.lang.Double
                .doubleToLongBits(v.asInstanceOf[Double])
              var k = 0
              while (k < 8) {
                b.write(((bits >>> (8 * k)) & 0xff).toInt); k += 1 }
            }
            streams += ((1, col, section(codecId, b.toByteArray)))
          case "string" | "binary" =>
            val bs = nn.map {
              case s: String => s.getBytes("UTF-8")
              case b: Array[Byte] => b
              case other => sys.error(s"bad value $other")
            }
            val data = new java.io.ByteArrayOutputStream()
            bs.foreach(b => data.write(b, 0, b.length))
            streams += ((1, col, section(codecId, data.toByteArray)))
            streams += ((2, col, section(codecId, intRleV1(
              bs.map(_.length.toLong), signed = false))))
          case k => sys.error(s"unsupported column kind $k")
        }
      }
      val ss = streams.result()
      ss.foreach { case (_, _, b) => buf.write(b, 0, b.length) }
      val dataLen = buf.size().toLong - offset
      // stripe footer
      val sf = new java.io.ByteArrayOutputStream()
      ss.foreach { case (kind, col, b) =>
        val st = new java.io.ByteArrayOutputStream()
        vfield(st, 1, kind.toLong)
        vfield(st, 2, col.toLong)
        vfield(st, 3, b.length.toLong)
        sfield(sf, 1, st.toByteArray)
      }
      (0 to cols.length).foreach { _ =>
        val enc = new java.io.ByteArrayOutputStream()
        vfield(enc, 1, 0L) // DIRECT
        sfield(sf, 2, enc.toByteArray)
      }
      sfield(sf, 3, "UTC".getBytes("UTF-8"))
      val sfBytes = section(codecId, sf.toByteArray)
      buf.write(sfBytes, 0, sfBytes.length)
      StripeMeta(offset, dataLen, sfBytes.length.toLong,
        (hi - lo).toLong)
    }

    val contentLength = buf.size().toLong
    // footer
    val f = new java.io.ByteArrayOutputStream()
    vfield(f, 1, 3L) // headerLength ("ORC")
    vfield(f, 2, contentLength)
    stripes.foreach { sm =>
      val s = new java.io.ByteArrayOutputStream()
      vfield(s, 1, sm.offset)
      vfield(s, 2, 0L) // indexLength (no row index)
      vfield(s, 3, sm.dataLen)
      vfield(s, 4, sm.footerLen)
      vfield(s, 5, sm.nRows)
      sfield(f, 3, s.toByteArray)
    }
    // types: root struct + one scalar per column
    locally {
      val root = new java.io.ByteArrayOutputStream()
      vfield(root, 1, 12L) // STRUCT
      cols.indices.foreach(i => vfield(root, 2, (i + 1).toLong))
      cols.foreach(c =>
        sfield(root, 3, c.name.getBytes("UTF-8")))
      sfield(f, 4, root.toByteArray)
      cols.foreach { c =>
        val t = new java.io.ByteArrayOutputStream()
        vfield(t, 1, orcKind(c.kind).toLong)
        sfield(f, 4, t.toByteArray)
      }
    }
    vfield(f, 6, nRows.toLong)
    vfield(f, 8, 0L) // rowIndexStride: no indexes
    val fBytes = section(codecId, f.toByteArray)
    buf.write(fBytes, 0, fBytes.length)

    // postscript (never compressed)
    val ps = new java.io.ByteArrayOutputStream()
    vfield(ps, 1, fBytes.length.toLong)
    vfield(ps, 2, codecId.toLong)
    vfield(ps, 3, BlockSize.toLong)
    writeTag(ps, 4, 0); writeVarint(ps, 0L) // version 0
    writeTag(ps, 4, 0); writeVarint(ps, 12L) // .12
    vfield(ps, 5, 0L) // metadataLength
    vfield(ps, 6, 1L) // writerVersion
    sfield(ps, 8000, "ORC".getBytes("UTF-8"))
    val psBytes = ps.toByteArray
    require(psBytes.length < 256, "postscript too large")
    buf.write(psBytes, 0, psBytes.length)
    buf.write(psBytes.length)
    buf.toByteArray
  }
}
