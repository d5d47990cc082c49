package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Motion-JPEG AVI: container round trip, positional stride sampling,
  * geometry-mismatch frame drops and malformed-container rejection —
  * sums hand-computed from the (v+7, v−4, v) constant-block JPEG
  * construction. */
class AviSpec extends AnyFunSuite {

  // one bw×bh-block baseline JPEG whose Y block k = vals(k)
  private def jpegOf(bw: Int, bh: Int, vals: Array[Int]): Array[Byte] =
    Jpeg.encodePixels(bw, bh, vals.map(_.toByte))

  // expected channel sums of such a frame: 64·Σ(v+off) per channel
  private def sums(bw: Int, bh: Int,
                   vals: Array[Int]): (Long, Long, Long) = {
    val vs = (0 until bw * bh).map(k => vals(k % vals.length).toLong)
    (64L * vs.map(_ + 7).sum, 64L * vs.map(_ - 4).sum, 64L * vs.sum)
  }

  test("stride sampling: every 2nd frame decodes with exact sums") {
    val bw = 3; val bh = 2
    val frames = (0 until 5).map(f =>
      Array.tabulate(bw * bh)(k => 40 + 10 * f + k))
    val avi = Multimodal.encodeAviMjpeg(8 * bw, 8 * bh, 40000,
      frames.map(jpegOf(bw, bh, _)))
    val got = Multimodal.aviFrameSample(7L, avi, 2)
    assert(got.map(_.frame_idx) == Seq(0, 2, 4))
    got.foreach { vf =>
      assert(vf.media_id == 7L)
      assert(vf.n_frames == 5 && vf.duration_ms == 200L)
      assert(vf.width == 8 * bw && vf.height == 8 * bh)
      val (er, eg, eb) = sums(bw, bh, frames(vf.frame_idx))
      assert((vf.sum_r, vf.sum_g, vf.sum_b) == ((er, eg, eb)))
    }
    // stride 1 walks all five; stride 3 takes 0 and 3
    assert(Multimodal.aviFrameSample(7L, avi, 1).map(_.frame_idx)
      == Seq(0, 1, 2, 3, 4))
    assert(Multimodal.aviFrameSample(7L, avi, 3).map(_.frame_idx)
      == Seq(0, 3))
  }

  test("geometry-mismatch frames drop but keep their index position") {
    val good = jpegOf(2, 2, Array(50, 60, 70, 80))
    val wrongDims = jpegOf(1, 1, Array(90)) // 8×8, header says 16×16
    val avi = Multimodal.encodeAviMjpeg(16, 16, 33333,
      Seq(good, wrongDims, good))
    val got = Multimodal.aviFrameSample(1L, avi, 1)
    assert(got.map(_.frame_idx) == Seq(0, 2))
  }

  test("undecodable frame payloads drop; sampling continues") {
    val good = jpegOf(1, 1, Array(100))
    val junk = Array.fill[Byte](31)(0x55) // odd length: pads the chunk
    val avi = Multimodal.encodeAviMjpeg(8, 8, 1000000,
      Seq(junk, good, junk, good))
    val got = Multimodal.aviFrameSample(2L, avi, 1)
    assert(got.map(_.frame_idx) == Seq(1, 3))
    assert(got.forall(_.duration_ms == 4000L))
  }

  test("malformed containers reject without throwing") {
    val good = Multimodal.encodeAviMjpeg(8, 8, 1000,
      Seq(jpegOf(1, 1, Array(42))))
    assert(Multimodal.aviFrameSample(0L, good, 1).nonEmpty)
    assert(Multimodal.aviFrameSample(0L, Array.emptyByteArray, 1).isEmpty)
    assert(Multimodal.aviFrameSample(0L, good.take(30), 1).isEmpty)
    val notAvi = good.clone(); notAvi(8) = 'W'
    assert(Multimodal.aviFrameSample(0L, notAvi, 1).isEmpty)
    val badSig = good.clone(); badSig(0) = 'X'
    assert(Multimodal.aviFrameSample(0L, badSig, 1).isEmpty)
    // truncating inside movi loses later frames, keeps the walk sane
    val cut = good.take(good.length - 3)
    assert(Multimodal.aviFrameSample(0L, cut, 1).isEmpty)
  }
}
