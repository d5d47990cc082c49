package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One multimodal record: an opaque binary payload plus typed metadata —
  * the storage shape for image/audio/video columns at 100 TB (binary stays
  * a byte column; only extracted features are materialized wide). */
case class MediaRow(media_id: Long, kind: String, data: Array[Byte])

/** Extracted features for one media row. `decoded_w`/`decoded_h` come from
  * the (stubbed) decoder; the rest is real byte-level plumbing. */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                         head8: String, content_hash: Long,
                         decoded_w: Int, decoded_h: Int)

/** One sampled frame from a media payload (frame-sample generator). */
case class FrameRow(media_id: Long, frame_idx: Int, frame_len: Int,
                    frame_hash: Long, frame_head: String)

/** Multimodal column plumbing: schema, partition-parallel feature
  * extraction (`mapPartitions` — one decoder instance per partition, the
  * shape a JNI/FFmpeg-backed decoder needs), and a STUB decode step.
  *
  * The decode itself is a clearly-marked deterministic fake — image/audio
  * libraries are not available in this environment — but the Spark-side
  * contract (binary column in, fixed-width feature struct out, per-
  * partition batching) is real and tested.
  */
object Multimodal {

  final val P = 1000000007L

  /** STUB decoder: stands in for e.g. JPEG dimension extraction. Derives
    * deterministic pseudo-dimensions from the payload; replace with a real
    * decoder binding in production. */
  def decodeStub(data: Array[Byte]): (Int, Int) = {
    val n = data.length
    (1 + n % 64, 1 + (n / 64) % 64)
  }

  /** Polynomial content hash over raw bytes (matches the engine's char
    * fold for ASCII payloads, so text-backed fixtures are oracle-able). */
  def contentHash(data: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < data.length) {
      acc = (acc * 31 + (data(i) & 0xffL)) % P
      i += 1
    }
    acc
  }

  /** Partition-parallel feature extraction: decoder state is created once
    * per partition (mapPartitions), rows stream through it. */
  def extractFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition decoder init would go here (JNI handle, model, ...)
      it.map { r =>
        val (w, h) = decodeStub(r.data)
        MediaFeatures(r.media_id, r.kind, r.data.length.toLong,
          new String(r.data.take(8), "UTF-8"), contentHash(r.data), w, h)
      }
    }
  }

  /** Frame size for the frame-sample generator (bytes per "frame"). */
  final val FrameBytes = 64

  /** Frame sampling: one media row generates its every-`stride`th frame
    * (the video → keyframe pattern). Generator semantics — one input row
    * fans out to many frame rows inside the same partition; at 100 TB
    * this runs frame decode where the bytes already live, and only the
    * sampled frames' features (length, hash, head) materialize wide.
    * Frame content itself is a byte slice (decode STUBBED like
    * decodeStub — the slicing/fan-out/feature plumbing is real). */
  def frameSample(rows: Dataset[MediaRow], stride: Int): Dataset[FrameRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition decoder init would go here
      it.flatMap { r =>
        val nFrames = (r.data.length + FrameBytes - 1) / FrameBytes
        (0 until nFrames).filter(_ % stride == 0).map { i =>
          val frame = r.data.slice(i * FrameBytes,
            math.min((i + 1) * FrameBytes, r.data.length))
          FrameRow(r.media_id, i, frame.length, contentHash(frame),
            new String(frame.take(8), "UTF-8"))
        }
      }
    }
  }

  /** Resize stub: byte-stride downsample to a w×h payload — stands in
    * for an image resampler; per-partition execution shape identical to
    * extractFeatures. */
  def resizeStub(data: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, w * h)
    if (data.length <= target) data
    else {
      val step = data.length.toDouble / target
      Array.tabulate(target)(i => data((i * step).toInt))
    }
  }

  /** Partition-parallel resize: binary in, smaller binary out. */
  def resize(rows: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.map(r =>
      r.copy(data = resizeStub(r.data, w, h))))
  }
}
