package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One MinHash band observation on the ingest stream: the producer
  * computes the SAME 16-permutation signature and 2×8 band fold as the
  * batch `minhash_lsh` (`minhash16` + the (a·31+x) mod P band hash),
  * so stream and batch agree on what "candidate near-duplicate"
  * means. One row per (doc, band). */
case class BandObs(docId: Long, tsNs: Long, band: Int, bv: Long)

/** Streaming near-dup candidate verdict: `anchor` is the first-seen
  * docId of this band bucket; `is_candidate` marks a doc that shares
  * the bucket with an EARLIER doc — the LSH admission signal. A doc's
  * overall verdict is the disjunction over its bands (any colliding
  * band makes it a candidate), exactly the batch banding semantics. */
case class NeardupVerdict(docId: Long, band: Int, bv: Long,
                          anchor: Long, is_candidate: Boolean)

/** Streaming MinHash-LSH near-dup ADMISSION GATE — the near-dup
  * sibling of [[StreamingDedup]] (exact fingerprints) for the ingest
  * path: a new document becomes a near-dup candidate the moment one
  * of its band buckets has been seen before, without ever comparing
  * against the corpus pairwise. State is ONE (anchor, firstTs) pair
  * per distinct band bucket — the streaming form of the batch
  * band-bucket join, bounded by the bucket space instead of the
  * corpus, and evicted `ttl` past the event-time watermark exactly
  * like [[StreamingDedup.verdictStream]] (content recurring later
  * than the TTL re-anchors, the bounded-state 100 TB default).
  * Candidates still need the exact-Jaccard verify the batch pipeline
  * applies (LSH admits false positives by design); this gate is the
  * sub-quadratic front of that funnel, live. */
object StreamingNeardup {

  /** Per-bucket anchor state. */
  case class BucketState(anchor: Long, firstTsNs: Long)

  def verdictStream(obs: Dataset[BandObs],
                    watermarkDelay: String = "10 seconds",
                    ttlMs: Long = 60000L,
                    timeout: GroupStateTimeout =
                      GroupStateTimeout.EventTimeTimeout)
      : Dataset[NeardupVerdict] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs
      .withColumn("ts", timestamp_micros(expr("tsNs div 1000")))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Long, Int, Long, java.sql.Timestamp)]
      .groupByKey(r => (r._3, r._4)) // band bucket
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(), timeout)(
        process(ttlMs, arm = timeout == GroupStateTimeout.EventTimeTimeout))
  }

  private def process(ttlMs: Long, arm: Boolean)(
      bucket: (Int, Long),
      rows: Iterator[(Long, Long, Int, Long, java.sql.Timestamp)],
      state: GroupState[BucketState]): Iterator[NeardupVerdict] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      // first-seen by event time, ties to the lowest docId — replay
      // and out-of-order arrival inside the watermark agree
      val batch = rows.map(r => (r._1, r._2)).toSeq
        .sortBy { case (id, ts) => (ts, id) }
      var st = state.getOption
      val out = batch.iterator.map { case (id, ts) =>
        st match {
          case None =>
            st = Some(BucketState(id, ts))
            NeardupVerdict(id, bucket._1, bucket._2, id,
              is_candidate = false)
          case Some(s) =>
            NeardupVerdict(id, bucket._1, bucket._2, s.anchor,
              is_candidate = id != s.anchor)
        }
      }.toVector
      st.foreach(state.update)
      if (arm)
        state.setTimeoutTimestamp(
          math.max(state.getCurrentWatermarkMs(), 0L) + ttlMs)
      out.iterator
    }
  }
}
