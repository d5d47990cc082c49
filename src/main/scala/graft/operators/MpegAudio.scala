package graft.operators

/** MPEG-1 Audio Layer I (ISO 11172-3) — REAL bitstream decode in pure
  * JVM: frame-header walk, 4-bit subband allocation, 6-bit
  * scalefactors, the interleaved 12×32 sample grid, and the Layer I
  * requantization formula
  * `s' = sf · (2^nb/(2^nb−1)) · (c/2^(nb−1) − 1 + 2^(1−nb))`.
  * Scalefactors follow the closed form `sf(idx) = 2·2^(−idx/3)` (the
  * table in the spec IS this geometric sequence), so no opaque
  * tabulated data is needed; the synthesis polyphase WINDOW (Table
  * 3-B.3) is numerically tabulated in the spec with no closed form,
  * so the PCM synthesis step stays honestly out of scope — subband
  * amplitudes are the decoder's output, exactly as a feature
  * extractor consumes them.
  *
  * Fixtures keep scalefactor indices at multiples of 3, making every
  * factor a power of two: the whole requantization chain is then
  * exact-or-single-rounded IEEE arithmetic that a SQL oracle
  * reproduces bit-identically. */
object MpegAudio {

  private final class BitWriter {
    private val buf = collection.mutable.ArrayBuffer.empty[Byte]
    private var acc = 0
    private var nb = 0
    def write(v: Int, bits: Int): Unit = {
      var k = bits - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >> k) & 1)
        nb += 1
        if (nb == 8) { buf += acc.toByte; acc = 0; nb = 0 }
        k -= 1
      }
    }
    def toArray(padTo: Int): Array[Byte] = {
      if (nb > 0) { buf += (acc << (8 - nb)).toByte; acc = 0; nb = 0 }
      while (buf.length < padTo) buf += 0
      buf.toArray
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int,
      val end: Int) {
    private var bit = 0
    def read(bits: Int): Int = {
      var v = 0
      var k = 0
      while (k < bits) {
        if (pos >= end) return -1
        v = (v << 1) | ((data(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        k += 1
      }
      v
    }
  }

  /** 32000 Hz mono, 64 kbps → 24 four-byte slots = 96-byte frames. */
  final val FrameBytes = 96

  /** One Layer I frame from per-subband (allocationNb, scfIdx, codes):
    * `allocs(sb)` is the CODED allocation (0 = silent, a → a+1 sample
    * bits); codes are the 12 raw samples of each active subband,
    * written in the spec's sample-major interleave. */
  def encodeFrame(allocs: Array[Int], scf: Array[Int],
      codes: Array[Array[Int]]): Array[Byte] = {
    require(allocs.length == 32)
    val w = new BitWriter
    w.write(0xFFF, 12) // sync
    w.write(1, 1)      // MPEG1
    w.write(3, 2)      // Layer I
    w.write(1, 1)      // no CRC
    w.write(2, 4)      // bitrate index 2 = 64 kbps
    w.write(2, 2)      // 32000 Hz
    w.write(0, 2)      // no padding, private 0
    w.write(3, 2)      // mono
    w.write(0, 6)      // mode ext / copyright / original / emphasis
    for (sb <- 0 until 32) w.write(allocs(sb), 4)
    for (sb <- 0 until 32; if allocs(sb) > 0) w.write(scf(sb), 6)
    for (s <- 0 until 12; sb <- 0 until 32; if allocs(sb) > 0)
      w.write(codes(sb)(s), allocs(sb) + 1)
    w.toArray(FrameBytes)
  }

  /** Decoded facts of one frame: active subbands, the raw-code sum,
    * and the requantized amplitude in summed integer micro-units. */
  final case class Mp1Frame(nActive: Int, sumCodes: Long, ampMicro: Long)

  private def rndAway(d: Double): Long =
    (if (d >= 0) math.floor(d + 0.5) else math.ceil(d - 0.5)).toLong

  /** Walk a Layer I stream; malformed frames (bad sync, non-Layer-I,
    * forbidden allocation 15, truncation) end the walk. */
  def decode(data: Array[Byte]): Seq[Mp1Frame] = {
    val out = Seq.newBuilder[Mp1Frame]
    var p = 0
    var ok = true
    while (ok && p + 4 <= data.length) {
      val h = ((data(p) & 0xff) << 24) | ((data(p + 1) & 0xff) << 16) |
        ((data(p + 2) & 0xff) << 8) | (data(p + 3) & 0xff)
      val sync = (h >>> 20) == 0xFFF
      val version = (h >>> 19) & 1
      val layer = (h >>> 17) & 3
      if (!sync || version != 1 || layer != 3 ||
        p + FrameBytes > data.length) ok = false
      else {
        val r = new BitReader(data, p + 4, p + FrameBytes)
        val allocs = Array.fill(32)(r.read(4))
        if (allocs.exists(a => a < 0 || a == 15)) ok = false
        else {
          val scf = Array.fill(32)(0)
          for (sb <- 0 until 32 if allocs(sb) > 0) scf(sb) = r.read(6)
          var sum = 0L
          var amp = 0L
          var trunc = false
          for (s <- 0 until 12; sb <- 0 until 32 if allocs(sb) > 0) {
            val nb = allocs(sb) + 1
            val c = r.read(nb)
            if (c < 0 || scf(sb) < 0) trunc = true
            else {
              sum += c
              val p2 = (1 << nb).toDouble
              val s2 = c / (p2 / 2) - 1.0 + 2.0 / p2
              val sf = 2.0 * math.pow(2.0, -(scf(sb) / 3)) *
                (scf(sb) % 3 match {
                  case 0 => 1.0
                  // non-multiple-of-3 indices use the spec's 2^(-1/3)
                  // geometric steps — correct but not oracle-exact;
                  // fixtures avoid them (scaladoc)
                  case 1 => math.pow(2.0, -1.0 / 3.0)
                  case _ => math.pow(2.0, -2.0 / 3.0)
                })
              amp += rndAway(s2 * (p2 / (p2 - 1.0)) * sf * 1e6)
            }
          }
          if (trunc) ok = false
          else {
            out += Mp1Frame(allocs.count(_ > 0), sum, amp)
            p += FrameBytes
          }
        }
      }
    }
    out.result()
  }
}
