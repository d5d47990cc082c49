package graft.streaming

import graft.functions.PolyHash
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document on the mixing/ingest stream. */
case class MixtureDoc(docId: Long, tsNs: Long, source: String, text: String)

/** Mixing verdict: `hash_drop` (failed the ppm threshold), `quota_drop`
  * (source already filled its target), or kept. */
case class MixtureVerdict(docId: Long, source: String, kept: Boolean,
                          reason: String)

/** Streaming twin of [[graft.Pipeline]]'s `mixture_sample`: enforce the
  * corpus mixture AT INGEST. The per-source ppm rates and keep targets
  * are static corpus metadata (the batch query computes them; a real
  * pipeline ships them as the mixture config), so the stream needs two
  * rules per document: the same seed-free scrambled-hash threshold as
  * the batch selection, then a per-source QUOTA counter so a source
  * cannot overshoot its target no matter how long the stream runs —
  * the piece a stateless batch filter cannot provide.
  *
  * State is ONE counter per source. Quota admission is causal
  * (first-come by event time, ties to the lowest docId within a
  * micro-batch) — like the dedup keeper, a stream cannot know a
  * lower-timestamp document is still in flight. */
object StreamingMixture {

  final val Scramble = 2654435761L

  def hashPpm(text: String): Long =
    PolyHash.hashBytes(text.getBytes("UTF-8")) * Scramble %
      graft.Pipeline.P % 1000000L

  /** `rates`: source → (ratePpm, kTarget) from the batch mixture table. */
  def verdicts(docs: Dataset[MixtureDoc],
               rates: Map[String, (Long, Long)]): Dataset[MixtureVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(rates)
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout)(process(bc))
  }

  private def process(
      bc: org.apache.spark.broadcast.Broadcast[Map[String, (Long, Long)]])(
      source: String, rows: Iterator[MixtureDoc],
      state: GroupState[Long]): Iterator[MixtureVerdict] = {
    // .value INSIDE the task closure — dereferencing on the driver would
    // capture the raw map and ship it per task, making the broadcast dead
    val (ratePpm, kTarget) = bc.value.getOrElse(source, (0L, 0L))
    var kept = state.getOption.getOrElse(0L)
    val out = rows.toSeq.sortBy(d => (d.tsNs, d.docId)).map { d =>
      if (hashPpm(d.text) >= ratePpm)
        MixtureVerdict(d.docId, source, kept = false, "hash_drop")
      else if (kept >= kTarget)
        MixtureVerdict(d.docId, source, kept = false, "quota_drop")
      else {
        kept += 1
        MixtureVerdict(d.docId, source, kept = true, "kept")
      }
    }
    state.update(kept)
    out.iterator
  }
}
