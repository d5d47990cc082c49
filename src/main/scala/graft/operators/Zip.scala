package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** ZIP archives (PKWARE APPNOTE / ISO 21320) — pure-JVM build + parse
  * of the container the other half of ad-hoc training data ships in:
  * local file headers, the central directory, the end-of-central-
  * directory record, STORED and DEFLATED (raw, nowrap) entries. The
  * parse walks the CENTRAL DIRECTORY (the authoritative index — local
  * headers alone mis-handle appended/overwritten archives), inflates
  * DEFLATED payloads, and VERIFIES each entry's CRC-32 — a corrupted
  * payload surfaces as a walk stop, never a silent wrong row.
  *
  * No reference analogue (north-star ingestion surface); the layout
  * is the public APPNOTE spec. */
object Zip {

  /** Parsed facts of one entry: name, method (0 stored / 8 deflated),
    * uncompressed size, and the md5 of the INFLATED content (so the
    * facts are independent of compressor version). */
  final case class ZipEntry(name: String, method: Int, size: Long,
      md5: String)

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def rd16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def deflateRaw(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflateRaw(data: Array[Byte], size: Int): Array[Byte] = {
    val inf = new Inflater(true)
    try {
      inf.setInput(data)
      val out = new Array[Byte](size)
      var done = 0
      while (done < size && !inf.finished()) {
        val n = inf.inflate(out, done, size - done)
        if (n == 0 && inf.needsInput()) return null // truncated
        done += n
      }
      if (done == size) out else null
    } finally inf.end() // release native memory on the truncated path too
  }

  /** Build an archive from (name, data, deflate?) triples: local
    * headers + payloads, central directory, EOCD. */
  def buildArchive(files: Seq[(String, Array[Byte], Boolean)])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val central = new java.io.ByteArrayOutputStream()
    var count = 0
    files.foreach { case (name, data, defl) =>
      val nameB = name.getBytes("UTF-8")
      val crc = new CRC32(); crc.update(data)
      val payload = if (defl) deflateRaw(data) else data
      val method = if (defl) 8 else 0
      val off = out.size()
      // local file header
      out.write(le32(0x04034b50L)); out.write(le16(20)) // version needed
      out.write(le16(0)); out.write(le16(method))
      out.write(le16(0)); out.write(le16(0))            // time/date
      out.write(le32(crc.getValue))
      out.write(le32(payload.length.toLong))
      out.write(le32(data.length.toLong))
      out.write(le16(nameB.length)); out.write(le16(0)) // extra len
      out.write(nameB); out.write(payload)
      // central directory entry
      central.write(le32(0x02014b50L))
      central.write(le16(20)); central.write(le16(20))
      central.write(le16(0)); central.write(le16(method))
      central.write(le16(0)); central.write(le16(0))
      central.write(le32(crc.getValue))
      central.write(le32(payload.length.toLong))
      central.write(le32(data.length.toLong))
      central.write(le16(nameB.length)); central.write(le16(0))
      central.write(le16(0)); central.write(le16(0))    // comment/disk
      central.write(le16(0)); central.write(le32(0L))   // attrs
      central.write(le32(off.toLong))
      central.write(nameB)
      count += 1
    }
    val cdOff = out.size()
    val cd = central.toByteArray
    out.write(cd)
    out.write(le32(0x06054b50L))                        // EOCD
    out.write(le16(0)); out.write(le16(0))
    out.write(le16(count)); out.write(le16(count))
    out.write(le32(cd.length.toLong)); out.write(le32(cdOff.toLong))
    out.write(le16(0))
    out.toByteArray
  }

  /** Walk via the central directory: locate EOCD from the tail, read
    * each CD entry, seek its local header, inflate if deflated, and
    * verify the CRC-32. Any inconsistency (bad signature, size
    * overrun, CRC mismatch, truncated stream) ends the walk. */
  def parse(data: Array[Byte]): Seq[ZipEntry] = {
    // EOCD: last occurrence of the signature in the final 64 KiB + 22
    var eocd = -1
    var i = data.length - 22
    val lo = math.max(0, data.length - 22 - 65535)
    while (eocd < 0 && i >= lo) {
      if (rd32(data, i) == 0x06054b50L) eocd = i
      i -= 1
    }
    if (eocd < 0) return Seq.empty
    val n = rd16(data, eocd + 10)
    val cdL = rd32(data, eocd + 16) // CD offset (untrusted 32-bit)
    var p = if (cdL > Int.MaxValue) -1 else cdL.toInt
    val out = Seq.newBuilder[ZipEntry]
    var k = 0
    var ok = true
    while (ok && k < n) {
      if (p < 0 || p + 46 > data.length ||
        rd32(data, p) != 0x02014b50L) ok = false
      else {
        val method = rd16(data, p + 10)
        val crcStored = rd32(data, p + 16)
        val csizeL = rd32(data, p + 20)
        val usizeL = rd32(data, p + 24)
        val nameLen = rd16(data, p + 28)
        val extraLen = rd16(data, p + 30)
        val cmtLen = rd16(data, p + 32)
        val lhoL = rd32(data, p + 42)
        val lho = if (lhoL > Int.MaxValue) -1 else lhoL.toInt
        // A 32-bit size field read from untrusted bytes can be
        // anything; DEFLATE expands at most ~1032:1, so a claimed
        // uncompressed size far beyond csize*1040 is a crafted bomb,
        // and either size beyond the archive/Int range would wrap or
        // over-allocate. Any of these ends the walk (never throws).
        val sizesSane = csizeL >= 0 && csizeL <= data.length &&
          usizeL >= 0 && usizeL <= math.min(Int.MaxValue.toLong - 8,
            csizeL * 1040L + 4096L)
        if (!sizesSane || p + 46 + nameLen > data.length ||
          lho < 0 || lho + 30 > data.length ||
          rd32(data, lho) != 0x04034b50L) ok = false
        else {
          val csize = csizeL.toInt
          val usize = usizeL.toInt
          val name = new String(data, p + 46, nameLen, "UTF-8")
          val lNameLen = rd16(data, lho + 26)
          val lExtraLen = rd16(data, lho + 28)
          val dataOff = lho + 30 + lNameLen + lExtraLen
          if (dataOff.toLong + csize > data.length) ok = false
          else {
            val payload = data.slice(dataOff, dataOff + csize)
            val content =
              if (method == 0) payload
              else if (method == 8) inflateRaw(payload, usize)
              else null
            if (content == null || content.length != usize) ok = false
            else {
              val crc = new CRC32(); crc.update(content)
              if (crc.getValue != crcStored) ok = false
              else out += ZipEntry(name, method, usize.toLong,
                md5hex(content))
            }
          }
        }
        p += 46 + nameLen + extraLen + cmtLen
      }
      k += 1
    }
    out.result()
  }
}
