package graft.streaming

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** One raw document entering the composed ingest application. */
case class IngestDoc(docId: Long, tsNs: Long, source: String, lang: String,
                     text: String)

/** A context chunk of a kept document (64-token window, 48 stride). */
case class ChunkRow(source: String, docId: Long, chunkId: Int, nTok: Long)

/** A packed chunk — identical fields to the batch `prepare_corpus` row,
  * so stream and batch outputs compare directly. */
case class PackedChunk(source: String, docId: Long, chunkId: Int,
                       nTok: Long, startOff: Long, seqId: Long,
                       spansBoundary: Boolean)

/** THE COMPOSED STREAMING CORPUS-INGEST APPLICATION — the whole
  * `prepare_corpus` DAG as ONE standing Structured-Streaming query, the
  * corpus-side counterpart of [[DetectorApp]]'s detector wiring:
  *
  *   raw documents ─ composite filter gate (stateless first-failing
  *       rules + the STATEFUL duplicate rule keyed by content
  *       fingerprint; flatMapGroupsWithState — the corpus_filter
  *       semantics, keeper causal by (event time, docId))
  *     → context chunking (stateless flatMap: 64-token windows at
  *       stride 48 — the doc_chunks geometry)
  *     → sequence packing (flatMapGroupsWithState keyed by SOURCE
  *       shard, state = ONE running token offset per shard — the
  *       seq_pack prefix sum)
  *
  * Both stateful stages run inside one streaming query (the
  * multiple-stateful-operator wiring DetectorApp established; the gate
  * is append-mode and timeout-free here — the standalone
  * [[StreamingCorpusFilter]] keeps the TTL-evicting variant).
  *
  * The batch twin IS the `prepare_corpus` query (oracle-checked):
  * CorpusAppSpec replays the real corpus through this stream in
  * adversarial micro-batch slices and pins row-identical output.
  *
  * Ordering contract (same as StreamingSeqPack): per source shard,
  * documents arrive in docId order across micro-batches; within a
  * micro-batch the group iterators sort. The gate's keeper election is
  * causal — on in-order replay it coincides with the batch
  * min(doc_id) keeper.
  *
  * 100 TB shape: the gate shuffles once on the 8-byte fingerprint
  * (state = one keeper pair per LIVE fingerprint); chunking is a pure
  * map; packing shuffles once on the shard key with O(#shards) longs of
  * state. No stage holds corpus-scale state or ships text beyond its
  * one keyed exchange. */
object CorpusApp {

  final val Win = 64
  final val Stride = 48
  final val Overlap = 16
  final val Budget = 256L

  // ---- stage 1: the composite filter gate ----

  def gateStage(docs: Dataset[IngestDoc]): Dataset[IngestDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupByKey(d => Multimodal.contentHash(d.text.getBytes("UTF-8")))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (_: Long, it: Iterator[IngestDoc],
         state: GroupState[StreamingCorpusFilter.KeeperState]) => {
          var st = state.getOption
          val out = it.toSeq.sortBy(d => (d.tsNs, d.docId)).flatMap { d =>
            val keeper = st match {
              case None =>
                st = Some(StreamingCorpusFilter.KeeperState(d.docId, d.tsNs))
                d.docId
              case Some(s) => s.keeper
            }
            if (d.docId == keeper &&
                StreamingCorpusFilter.ruleReason(d.text, d.lang) == "keep")
              Some(d)
            else None
          }
          st.foreach(state.update)
          out.iterator
        })
  }

  // ---- stage 2: context chunking (stateless) ----

  def chunkStage(docs: Dataset[IngestDoc]): Dataset[ChunkRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap { d =>
      val n = d.text.split(" ", -1).length
      val nChunks =
        math.max(math.ceil((n - Overlap) / Stride.toDouble).toInt, 1)
      (0 until nChunks).map { i =>
        ChunkRow(d.source, d.docId, i, math.min(Win, n - i * Stride).toLong)
      }
    }
  }

  // ---- stage 3: sequence packing (per-shard running offset) ----

  def packStage(chunks: Dataset[ChunkRow],
                budget: Long = Budget): Dataset[PackedChunk] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (src: String, it: Iterator[ChunkRow], state: GroupState[Long]) => {
          var off = state.getOption.getOrElse(0L)
          val out = it.toArray.sortBy(c => (c.docId, c.chunkId)).map { c =>
            val start = off
            off += c.nTok
            PackedChunk(src, c.docId, c.chunkId, c.nTok, start,
              start / budget,
              (start + c.nTok - 1) / budget != start / budget)
          }
          state.update(off)
          out.iterator
        })
  }

  /** The composed stream: gate → chunk → pack. */
  def composedStream(docs: Dataset[IngestDoc]): Dataset[PackedChunk] =
    packStage(chunkStage(gateStage(docs)))

  /** The standing application: raw-document json lines in, packed
    * training chunks out as parquet. */
  def run(spark: SparkSession, inDir: String, outDir: String,
          checkpointDir: String,
          trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : StreamingQuery = {
    import spark.implicits._
    val docs = spark.readStream
      .schema("docId LONG, tsNs LONG, source STRING, lang STRING, text STRING")
      .json(inDir)
      .as[IngestDoc]
    composedStream(docs)
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[PackedChunk], _: Long) =>
        batch.write.mode("append").parquet(s"$outDir/packed")
        ()
      }
      .start()
  }
}
