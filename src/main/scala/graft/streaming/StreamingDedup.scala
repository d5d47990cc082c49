package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One document on the ingest stream: event-time + content fingerprint
  * (producers compute the fingerprint with the same compound key as the
  * batch `dedup_exact` — forward/reverse poly-hash + length — so stream
  * and batch agree on what "same content" means). */
case class StreamDoc(docId: Long, tsNs: Long, fp: Long)

/** Streaming dedup verdict: keeper = first-seen docId of the
  * fingerprint; a pipeline routes `is_dup` rows away instead of
  * silently dropping them (the difference between `dropDuplicates` and
  * an auditable dedup). */
case class DedupVerdict(docId: Long, fp: Long, keeper: Long, is_dup: Boolean)

/** Streaming exact deduplication for the ingest path (SURVEY §2 north
  * star: the batch `dedup_exact` has to exist on the stream too, or
  * every replay re-admits duplicates).
  *
  * Two forms:
  *
  *   - [[keptStream]]: Spark's built-in watermarked
  *     `dropDuplicatesWithinWatermark` — kept-only rows, state evicted
  *     once the watermark passes (bounded state, the 100 TB default);
  *   - [[verdictStream]]: `mapGroupsWithState` keyed by fingerprint that
  *     EMITS a verdict row per document (keeper + is_dup) — the shape a
  *     training pipeline needs to route duplicates to a quarantine sink
  *     and keep lineage. State is one (keeper, firstTs) pair per
  *     distinct fingerprint; an event-time timeout evicts fingerprints
  *     `ttl` past the watermark, mirroring the built-in's bound.
  *
  * Keeper choice is FIRST-SEEN BY EVENT TIME within a micro-batch (ties
  * to the lowest docId), so replays and out-of-order arrival inside the
  * watermark produce identical verdicts — the property `dropDuplicates`
  * (arrival-order) cannot give. */
object StreamingDedup {

  def keptStream(docs: Dataset[StreamDoc],
                 watermarkDelay: String = "10 seconds"): Dataset[StreamDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("ts", timestamp_micros(expr("tsNs div 1000")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
      .drop("ts")
      .as[StreamDoc]
  }

  /** Per-fingerprint keeper state. */
  case class FpState(keeper: Long, firstTsNs: Long)

  def verdictStream(docs: Dataset[StreamDoc],
                    watermarkDelay: String = "10 seconds",
                    ttlMs: Long = 60000L,
                    timeout: GroupStateTimeout =
                      GroupStateTimeout.EventTimeTimeout)
      : Dataset[DedupVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("ts", timestamp_micros(expr("tsNs div 1000")))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._3) // fingerprint
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(), timeout)(
        process(ttlMs, arm = timeout == GroupStateTimeout.EventTimeTimeout))
  }

  private def process(ttlMs: Long, arm: Boolean)(
      fp: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
      state: GroupState[FpState]): Iterator[DedupVerdict] = {
    if (state.hasTimedOut) {
      // fingerprint evicted: content recurring later than the TTL is
      // re-admitted, exactly like dropDuplicatesWithinWatermark
      state.remove()
      Iterator.empty
    } else {
      val batch = rows.map(r => (r._1, r._2)).toSeq
        .sortBy { case (id, ts) => (ts, id) }
      var st = state.getOption
      val out = batch.iterator.map { case (id, ts) =>
        st match {
          case None =>
            st = Some(FpState(id, ts))
            DedupVerdict(id, fp, id, is_dup = false)
          case Some(s) =>
            DedupVerdict(id, fp, s.keeper, is_dup = id != s.keeper)
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
