package graft.streaming

import graft.operators.HtmlText
import org.apache.spark.sql.Dataset

/** One raw page on the ingest stream. */
case class HtmlDoc(docId: Long, tsNs: Long, html: String)

/** Extraction output: the visible text plus the cheap shape facts a
  * downstream quality gate keys on without re-reading the string. */
case class ExtractedDoc(docId: Long, text: String, n_chars: Int,
                        n_words: Int, html_ratio_pct: Int)

/** Streaming twin of `html_extract`: the HtmlText state machine run as
  * the first stage of the web-ingest path — raw HTML in, visible text
  * out — so markup, scripts and boilerplate entities never reach the
  * tokenizer. Stateless per row (pure map, append mode, no shuffle):
  * the same function serves bounded and unbounded inputs, and the
  * parity spec pins them equal through a real MemoryStream run.
  *
  * `html_ratio_pct` = 100·extracted/raw length — the classic "is this
  * page mostly markup" retention signal (low ratio ⇒ nav/boilerplate
  * page), integer so any SQL twin agrees exactly. */
object StreamingHtmlExtract {

  /** Extract one page (shared by batch and stream). */
  def extractOne(d: HtmlDoc): ExtractedDoc = {
    val t = HtmlText.extractText(d.html)
    val words = if (t.isEmpty) 0 else t.count(_ == ' ') + 1
    val ratio =
      if (d.html.isEmpty) 0
      else ((100L * t.length) / d.html.length).toInt
    ExtractedDoc(d.docId, t, t.length, words, ratio)
  }

  /** Extract a (bounded or streaming) Dataset — identical plan shape
    * either way: one mapPartitions, zero state. */
  def extract(docs: Dataset[HtmlDoc]): Dataset[ExtractedDoc] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions(_.map(extractOne))
  }
}
