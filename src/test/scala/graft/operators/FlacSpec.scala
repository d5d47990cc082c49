package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec pins: exact encode↔decode round trips across subframe
  * types and frame boundaries, the CRC-8/CRC-16 implementations
  * against the standard check vectors (independent of our decoder),
  * a HAND-ASSEMBLED bitstream decoded without our encoder in the
  * loop (including an LPC subframe the encoder never emits), subset
  * rejection, and mutation fuzz (the two CRCs make single-bit
  * corruption detectable; decode never throws). */
class FlacSpec extends AnyFunSuite {

  private def rt(samples: Array[Int], rate: Int = 8000): Unit = {
    val enc = Flac.encode(rate, samples)
    val got = Flac.decode(enc)
    assert(got.isDefined, s"decode failed for n=${samples.length}")
    val (info, out) = got.get
    assert(info.sampleRate == rate && info.channels == 1 && info.bits == 16)
    assert(info.totalSamples == samples.length)
    assert(out.toSeq == samples.toSeq)
  }

  test("round trips: constant, ramp, noise, alternating, empty") {
    rt(Array.fill(100)(1234))
    rt(Array.fill(100)(-32768))
    rt(Array.tabulate(500)(i => i * 7 - 1000))       // linear: FIXED-2
    rt(Array.tabulate(300)(i =>
      (((i * 2654435761L) >> 7) % 65536 - 32768).toInt))
    rt(Array.tabulate(64)(i => if (i % 2 == 0) 32767 else -32768))
    rt(Array.emptyByteArray.map(_.toInt))             // zero samples
    rt(Array(42))                                     // single sample
  }

  test("multi-frame streams cross 4096-sample boundaries exactly") {
    rt(Array.tabulate(4096)(i => i % 100))            // exactly one block
    rt(Array.tabulate(4097)(_ % 97))                  // 1-sample tail
    rt(Array.tabulate(10000)(i => (i * 31) % 2000 - 1000))
  }

  test("utf8-coded frame numbers go multi-byte past frame 127") {
    // 130 frames forces 2-byte frame indices in the headers
    rt(Array.tabulate(130 * 4096)(i => (i / 4096) % 256))
  }

  test("STREAMINFO MD5 signs the decoded audio end to end") {
    val samples = Array.tabulate(300)(i => (i * 17) % 1000 - 500)
    val enc = Flac.encode(8000, samples)
    // the stored MD5 is the raw LE16 digest
    val stored = java.util.Arrays.copyOfRange(enc, 8 + 18, 8 + 34)
    assert(stored.toSeq == Flac.sampleMd5(samples).toSeq)
    // flipping one stored-MD5 byte makes decode reject
    val m = enc.clone()
    m(8 + 20) = (m(8 + 20) ^ 1).toByte
    assert(Flac.decode(m).isEmpty)
  }

  test("CRC-8 and CRC-16 match the standard check vectors") {
    val check = "123456789".getBytes("US-ASCII")
    assert(Flac.crc8(check, 0, check.length) == 0xF4)   // CRC-8 (0x07)
    assert(Flac.crc16(check, 0, check.length) == 0xFEE8) // CRC-16/BUYPASS
  }

  /** Minimal MSB-first writer, independent of the operator's. */
  private final class W {
    val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def u(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
        i -= 1
      }
    }
    def bytes: Array[Byte] = { require(n == 0); out.toByteArray }
  }

  private def streamInfo(rate: Int, total: Long): Array[Byte] = {
    val w = new W
    w.u(4096, 16); w.u(4096, 16); w.u(0, 24); w.u(0, 24)
    w.u(rate, 20); w.u(0, 3); w.u(15, 5); w.u(total, 36)
    w.u(0, 64); w.u(0, 64)
    w.bytes
  }

  test("hand-assembled CONSTANT stream decodes (no encoder in the loop)") {
    val head = new W
    head.u(0x664C6143L, 32) // "fLaC"
    head.u(0x80, 8); head.u(34, 24)
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.bytes); out.write(streamInfo(8000, 4))
    // frame: sync, fixed blocking, blocksize 16-bit explicit (4-1),
    // rate from STREAMINFO, mono, 16-bit, frame 0
    val fh = new W
    fh.u(0x3ffe, 14); fh.u(0, 1); fh.u(0, 1)
    fh.u(7, 4); fh.u(0, 4); fh.u(0, 4); fh.u(4, 3); fh.u(0, 1)
    fh.u(0, 8)      // frame number 0
    fh.u(3, 16)     // blocksize − 1
    val fhB = fh.bytes
    val body = new W
    fhB.foreach(b => body.u(b & 0xffL, 8))
    body.u(Flac.crc8(fhB, 0, fhB.length), 8)
    body.u(0, 1); body.u(0, 6); body.u(0, 1) // CONSTANT subframe
    body.u(-5L & 0xffff, 16)                 // the constant: −5
    val noCrc = body.bytes
    out.write(noCrc)
    val c16 = Flac.crc16(noCrc, 0, noCrc.length)
    out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
    val got = Flac.decode(out.toByteArray)
    assert(got.isDefined, "hand-assembled stream rejected")
    assert(got.get._2.toSeq == Seq(-5, -5, -5, -5))
  }

  test("hand-assembled LPC subframe decodes (coef 1, shift 0 == lag-1)") {
    val samples = Seq(100, 103, 103, 106) // warmup 100, then +3, 0, +3
    val head = new W
    head.u(0x664C6143L, 32)
    head.u(0x80, 8); head.u(34, 24)
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.bytes); out.write(streamInfo(8000, 4))
    val fh = new W
    fh.u(0x3ffe, 14); fh.u(0, 1); fh.u(0, 1)
    fh.u(7, 4); fh.u(0, 4); fh.u(0, 4); fh.u(4, 3); fh.u(0, 1)
    fh.u(0, 8); fh.u(3, 16)
    val fhB = fh.bytes
    val body = new W
    fhB.foreach(b => body.u(b & 0xffL, 8))
    body.u(Flac.crc8(fhB, 0, fhB.length), 8)
    body.u(0, 1); body.u(32, 6); body.u(0, 1) // LPC order 1 (100000)
    body.u(100L, 16)                          // warmup sample
    body.u(4, 4)                              // precision − 1 = 4 → 5 bits
    body.u(0, 5)                              // shift 0
    body.u(1, 5)                              // coefficient +1
    body.u(0, 2); body.u(0, 4)                // rice method 0, order 0
    body.u(2, 4)                              // rice parameter k = 2
    // residuals 3, 0, 3 → zigzag 6, 0, 6 → q=1 rem 2, q=0 rem 0, q=1 rem 2
    body.u(1, 2); body.u(2, 2)                // 0b01 unary(1), rem 2
    body.u(1, 1); body.u(0, 2)                // unary(0), rem 0
    body.u(1, 2); body.u(2, 2)
    body.u(0, 5)                              // pad to the byte boundary
    val noCrc = body.bytes
    out.write(noCrc)
    val c16 = Flac.crc16(noCrc, 0, noCrc.length)
    out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
    val got = Flac.decode(out.toByteArray)
    assert(got.isDefined, "hand-assembled LPC stream rejected")
    assert(got.get._2.toSeq == samples)
  }

  test("out-of-subset and malformed streams reject, never throw") {
    // stereo STREAMINFO
    val head = new W
    head.u(0x664C6143L, 32); head.u(0x80, 8); head.u(34, 24)
    val si = new W
    si.u(4096, 16); si.u(4096, 16); si.u(0, 24); si.u(0, 24)
    si.u(8000, 20); si.u(1, 3); si.u(15, 5); si.u(0, 36)
    si.u(0, 64); si.u(0, 64)
    val stereo = head.bytes ++ si.bytes
    assert(Flac.decode(stereo).isEmpty)
    assert(Flac.decode(Array.emptyByteArray).isEmpty)
    assert(Flac.decode("fLaCxxxx".getBytes("US-ASCII")).isEmpty)
    val good = Flac.encode(8000, Array.tabulate(200)(i => i * 3 % 512))
    for (cut <- 0 until good.length)
      Flac.decode(java.util.Arrays.copyOfRange(good, 0, cut)) // no throw
  }

  test("mutation fuzz: the CRCs catch corruption; decode never throws") {
    val good = Flac.encode(8000,
      Array.tabulate(500)(i => ((i * 2654435761L) % 4000 - 2000).toInt))
    assert(Flac.decode(good).isDefined)
    val rnd = new scala.util.Random(4242)
    var rejected = 0
    for (_ <- 0 until 400) {
      val m = good.clone()
      // flip a bit in the frame region (past the 42-byte metadata)
      val at = 42 + rnd.nextInt(m.length - 42)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      if (Flac.decode(m).isEmpty) rejected += 1 // and never throws
    }
    // every frame-region flip lands under a CRC: corruption DETECTS
    assert(rejected == 400, s"only $rejected/400 corruptions rejected")
  }
}
