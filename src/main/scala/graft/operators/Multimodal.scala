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
}
