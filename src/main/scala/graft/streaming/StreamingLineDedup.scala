package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One line of one document on the ingest stream — the streaming unit
  * of C4/RefinedWeb line-level dedup (the batch `line_dedup`). */
case class StreamLine(docId: Long, lineNo: Long, line: String)

/** Per-line verdict: the settled keeper instance and whether THIS
  * instance is it. A pipeline keeps `kept` lines and routes the rest
  * to a quarantine sink with lineage intact. */
case class LineVerdict(docId: Long, lineNo: Long, line: String,
    keeperDoc: Long, keeperLine: Long, kept: Boolean)

/** Streaming line-level exact dedup — the ingest twin of the batch
  * `line_dedup`: every distinct line survives only at its first
  * occurrence; later copies (in the same document, later documents, or
  * replays) are flagged. State is one (keeperDoc, keeperLine) pair per
  * distinct line seen, keyed by the line text; within a micro-batch
  * rows settle in (docId, lineNo) order, so a doc_id-ordered replay of
  * a corpus produces EXACTLY the batch keeper assignment regardless of
  * how the stream is micro-batched (pinned by the parity spec).
  *
  * 100 TB shape: state is the distinct-line dimension, the same table
  * the batch keeper aggregate shuffles; for byte-bound state stores
  * key by a 128-bit line fingerprint instead of the text (the
  * StreamingDedup move) — verdicts are unchanged on any corpus without
  * fingerprint collisions. */
object StreamingLineDedup {

  /** Stream-side chunker, IDENTICAL to the batch `Pipeline.docLines`
    * rule: lines are consecutive `lineWords`-word chunks. Stateless
    * map — safe on any stream. */
  def explodeLines(docs: Dataset[(Long, String)], lineWords: Int = 3)
      : Dataset[StreamLine] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap { case (id, text) =>
      val ws = text.split(" ", -1)
      (0 to (ws.length - 1) / lineWords).map { j =>
        StreamLine(id, j.toLong,
          ws.slice(j * lineWords, j * lineWords + lineWords).mkString(" "))
      }
    }
  }

  /** Keeper state per distinct line. */
  case class LineState(keeperDoc: Long, keeperLine: Long)

  def verdictStream(lines: Dataset[StreamLine]): Dataset[LineVerdict] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines
      .groupByKey(_.line)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout)(process)
  }

  private def process(line: String, rows: Iterator[StreamLine],
      state: GroupState[LineState]): Iterator[LineVerdict] = {
    val batch = rows.toSeq.sortBy(r => (r.docId, r.lineNo))
    var st = state.getOption
    val out = batch.map { r =>
      st match {
        case None =>
          st = Some(LineState(r.docId, r.lineNo))
          LineVerdict(r.docId, r.lineNo, r.line, r.docId, r.lineNo,
            kept = true)
        case Some(s) =>
          LineVerdict(r.docId, r.lineNo, r.line, s.keeperDoc, s.keeperLine,
            kept = r.docId == s.keeperDoc && r.lineNo == s.keeperLine)
      }
    }
    st.foreach(state.update)
    out.iterator
  }
}
