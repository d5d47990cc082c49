package graft.streaming

import org.apache.spark.sql.Dataset

/** THE COMPOSED STREAMING WEB-INGEST APPLICATION — the standing-query
  * twin of the batch `web_ingest_dag`: WARC archives arrive on the
  * stream, records parse and their HTML payloads extract statelessly,
  * lines explode with the batch chunk rule, and the global line-dedup
  * state flags every line against its first-ever occurrence. The
  * per-document keep verdict folds downstream of [[composedStream]]
  * (foreachBatch or a follow-on aggregation — the parity spec folds and
  * proves stream == batch on the real corpus).
  *
  * 100 TB shape: the only state is [[StreamingLineDedup]]'s
  * distinct-line keeper table; parse + extract are pure flatMaps, so
  * the stream scales exactly as the batch DAG's parse side does. */
object WebIngest {

  /** Stateless archive → document stage: WARC record walk + HTML text
    * extraction; doc ids recover from the target URIs. */
  def extractStage(archives: Dataset[(Long, Array[Byte])])
      : Dataset[(Long, String)] = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.flatMap { case (_, bytes) =>
      graft.operators.Warc.parseArchiveBodies(bytes).map {
        case (uri, body) =>
          (uri.substring(uri.lastIndexOf('/') + 1).toLong,
            graft.operators.HtmlText.extractText(body))
      }
    }
  }

  /** archives → extract → line explode → global line-dedup verdicts. */
  def composedStream(archives: Dataset[(Long, Array[Byte])])
      : Dataset[LineVerdict] =
    StreamingLineDedup.verdictStream(
      StreamingLineDedup.explodeLines(extractStage(archives)))
}
