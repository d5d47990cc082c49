package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document on the ingest-filter stream. */
case class FilterDoc(docId: Long, tsNs: Long, text: String, lang: String)

/** Filter verdict — same columns as the batch `corpus_filter` row. */
case class FilterVerdict(docId: Long, keep: Boolean, reason: String)

/** Streaming twin of the batch `corpus_filter` (SURVEY north star: the
  * composite keep/drop gate has to exist on the ingest stream, or replays
  * re-admit what the batch pass dropped).
  *
  * The stateless rules (language allowlist, length floor, punctuation
  * ceiling, stopword ceiling) evaluate per row before any grouping; the
  * one STATEFUL rule — duplicate-of-an-earlier-keeper — runs keyed by
  * content fingerprint with the same event-time-keeper semantics as
  * [[StreamingDedup]] (first-seen by event time, ties to the lowest
  * docId, TTL eviction against the watermark). Rule priority matches the
  * batch CASE order: duplicate wins over every stateless reason.
  *
  * Keeper IDENTITY is therefore causal — first by event time — not the
  * batch pass's min(doc_id) canonicalization (a stream cannot know a
  * lower id is still coming). On out-of-order ingest the two passes
  * agree that exactly ONE row survives per fingerprint but may elect
  * different representatives; the real-corpus parity spec replays in
  * order, where the rules coincide, and a dedicated spec case pins the
  * out-of-order election.
  *
  * State is one (keeper, firstTs) pair per LIVE fingerprint — identical
  * bound to StreamingDedup, nothing grows with the stream. */
object StreamingCorpusFilter {

  final val LangAllow = Set("en", "de", "fr", "es")

  /** The stateless first-failing-rule reason — the exact Scala mirror of
    * the batch SQL CASE (ASCII punctuation class, split-keeping-empties
    * tokenization), shared with the parity spec. */
  def ruleReason(text: String, lang: String): String = {
    val tk = text.split(" ", -1)
    val nPunct = text.count(c => !(c >= '0' && c <= '9' ||
      c >= 'A' && c <= 'Z' || c >= 'a' && c <= 'z' || c == ' '))
    val nStop = tk.count(t => t == "the" || t == "a")
    if (!LangAllow(lang)) "lang"
    else if (tk.length < 20) "too_short"
    else if (nPunct.toDouble / math.max(text.length, 1) > 0.1) "punct_heavy"
    else if (nStop.toDouble / tk.length > 0.15) "stopwordy"
    else "keep"
  }

  /** Per-fingerprint keeper state (the dedup rule's memory). */
  case class KeeperState(keeper: Long, firstTsNs: Long)

  def verdicts(docs: Dataset[FilterDoc],
               watermarkDelay: String = "10 seconds",
               ttlMs: Long = 60000L,
               timeout: GroupStateTimeout = GroupStateTimeout.EventTimeTimeout)
      : Dataset[FilterVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .map(d => (d.docId, d.tsNs,
        graft.operators.Multimodal.contentHash(d.text.getBytes("UTF-8")),
        ruleReason(d.text, d.lang)))
      .withColumn("ts", timestamp_micros(expr("_2 div 1000")))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._3) // fingerprint
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        process(ttlMs, arm = timeout == GroupStateTimeout.EventTimeTimeout))
  }

  private def process(ttlMs: Long, arm: Boolean)(
      fp: Long, rows: Iterator[(Long, Long, Long, String, java.sql.Timestamp)],
      state: GroupState[KeeperState]): Iterator[FilterVerdict] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val batch = rows.map(r => (r._1, r._2, r._4)).toSeq
        .sortBy { case (id, ts, _) => (ts, id) }
      var st = state.getOption
      val out = batch.map { case (id, ts, reason) =>
        val keeper = st match {
          case None => st = Some(KeeperState(id, ts)); id
          case Some(s) => s.keeper
        }
        val r = if (id != keeper) "duplicate" else reason
        FilterVerdict(id, r == "keep", r)
      }
      st.foreach(state.update)
      if (arm)
        state.setTimeoutTimestamp(
          math.max(state.getCurrentWatermarkMs(), 0L) + ttlMs)
      out.iterator
    }
  }
}
