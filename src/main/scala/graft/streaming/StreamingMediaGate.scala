package graft.streaming

import graft.operators.{Jpeg, Multimodal}
import org.apache.spark.sql.Dataset

/** One media object on the ingest stream: binary payload + kind. */
case class MediaDoc(mediaId: Long, tsNs: Long, kind: String,
                    data: Array[Byte])

/** Media gate verdict — decode health + the integer quality facts a
  * multimodal training pipeline keys retention on. */
case class MediaVerdict(mediaId: Long, kind: String, width: Int,
                        height: Int, mean_luma: Int, contrast: Int,
                        decode_ok: Boolean, keep: Boolean)

/** Streaming twin of the multimodal quality family: full pixel decode
  * (PNG/GIF/TIFF/baseline+progressive JPEG — operators.Multimodal and
  * operators.Jpeg) and an integer-exact quality gate evaluated on the
  * ingest stream, so undecodable or degenerate images never reach the
  * lake (the batch `image_quality_gate` query is the audit pass; this
  * is the gate).
  *
  * Everything is STATELESS per row — a pure map, append mode, no
  * watermark, no shuffle, no broadcast: the one shape that behaves
  * identically on a bounded Dataset and an unbounded stream, which is
  * why [[verdicts]] is literally the same function for both (the
  * parity spec still pins it through a real MemoryStream run).
  *
  * Gate rule (all integer arithmetic, so batch SQL, the DuckDB oracle
  * and this gate agree bit-for-bit): per-pixel luma = (r+g+b)/3
  * (floor); keep = decoded ∧ w≥8 ∧ h≥8 ∧ 16 ≤ meanLuma ≤ 240 ∧
  * (maxLuma − minLuma) ≥ 8. The bounds drop unreadably dark/blown-out
  * and near-flat (synthetic/empty) images — the classic first-pass
  * web-image filters. */
object StreamingMediaGate {

  /** Decode + gate one payload (shared by batch and stream). */
  def verdict(mediaId: Long, kind: String,
              data: Array[Byte]): MediaVerdict =
    Multimodal.decodePixels(kind, data) match {
      case Some((w, h, rgb)) =>
        var i = 0
        var sum = 0L
        var mn = 255
        var mx = 0
        while (i < rgb.length) {
          val luma = ((rgb(i) & 0xff) + (rgb(i + 1) & 0xff) +
            (rgb(i + 2) & 0xff)) / 3
          sum += luma
          if (luma < mn) mn = luma
          if (luma > mx) mx = luma
          i += 3
        }
        val n = w.toLong * h
        val mean = (sum / n).toInt
        val contrast = mx - mn
        val keep = w >= 8 && h >= 8 && mean >= 16 && mean <= 240 &&
          contrast >= 8
        MediaVerdict(mediaId, kind, w, h, mean, contrast,
          decode_ok = true, keep = keep)
      case None =>
        MediaVerdict(mediaId, kind, -1, -1, -1, -1,
          decode_ok = false, keep = false)
    }

  /** Gate a (bounded or streaming) Dataset — identical plan shape
    * either way: one mapPartitions, zero state. */
  def verdicts(docs: Dataset[MediaDoc]): Dataset[MediaVerdict] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions(_.map(d => verdict(d.mediaId, d.kind, d.data)))
  }

  /** Convenience: JPEG-encode a luma matrix for spec fixtures (the
    * oracle path builds PNG fixtures in Pipeline instead). */
  def grayJpeg(bw: Int, bh: Int, blockLuma: Int => Int): Array[Byte] = {
    val ones = Array.fill(64)(1)
    Jpeg.encodeBaseline(8 * bw, 8 * bh, Seq((1, 1)), Seq(ones, ones),
      Seq(0), (_, s) => {
        val a = new Array[Int](64)
        a(0) = 8 * (blockLuma(s) - 128)
        a
      })
  }
}
