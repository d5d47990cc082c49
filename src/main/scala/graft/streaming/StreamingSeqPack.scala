package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document on the packing stream: source shard + token count (the
  * producer counts tokens the same way the batch `seq_pack` does). */
case class PackDoc(source: String, docId: Long, nTokens: Long)

/** Packing assignment — identical columns to the batch `seq_pack` row,
  * so stream and batch outputs compare directly. */
case class PackAssign(source: String, docId: Long, nTokens: Long,
                      startOff: Long, seqId: Long, spansBoundary: Boolean)

/** Streaming twin of the batch `seq_pack` (GPT-style concat-then-split
  * packing): `flatMapGroupsWithState` keyed by SOURCE SHARD, whose whole
  * state is ONE running token offset per shard — the stream equivalent
  * of the batch prefix-sum window.
  *
  * Ingest contract (same as the batch ORDER BY doc_id): documents
  * arrive per-shard in docId order ACROSS micro-batches; within a
  * micro-batch arrival order is free (the group iterator is sorted).
  * Under that contract the stream reproduces the batch assignment
  * row-for-row on any micro-batch slicing — proven on the real corpus
  * in StreamingSeqPackSpec with adversarial batch boundaries.
  *
  * State is O(#shards) longs, never grows with documents — the packing
  * counterpart of StreamingDedup's bounded fingerprint state. */
object StreamingSeqPack {

  final val DefaultBudget = 256L

  def packStream(docs: Dataset[PackDoc],
                 budget: Long = DefaultBudget): Dataset[PackAssign] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout)(process(budget))
  }

  private def process(budget: Long)(
      source: String, it: Iterator[PackDoc],
      state: GroupState[Long]): Iterator[PackAssign] = {
    var off = state.getOption.getOrElse(0L)
    val out = it.toArray.sortBy(_.docId).map { d =>
      val start = off
      off += d.nTokens
      PackAssign(source, d.docId, d.nTokens, start, start / budget,
        (start + d.nTokens - 1) / budget != start / budget)
    }
    state.update(off)
    out.iterator
  }
}
