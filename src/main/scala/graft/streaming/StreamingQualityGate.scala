package graft.streaming

import org.apache.spark.sql.Dataset

/** Per-document verdict from the frozen NB quality model: fixed-point
  * total score (1e-6 units, prior included) and the NB decision. */
case class QualityVerdict(docId: Long, nTokens: Int, scoreFp: Long,
                          predRef: Boolean)

/** Streaming twin of the batch `quality_classifier`: the ingest-time
  * quality gate. The batch query trains AND scores in one plan (the
  * audit pass); a deployed filter instead ships a FROZEN model to the
  * stream workers and scores each arriving document statelessly — this
  * is that gate, scoring with the exact fixed-point (word → llr) table
  * the batch side trains ([[graft.Pipeline.nbFrozen]]), so stream and
  * batch verdicts agree bit-for-bit on the training corpus.
  *
  * Everything is a pure map in append mode — no state, no watermark, no
  * shuffle. The model rides a broadcast variable (capped at
  * `Pipeline.QcGateVocab` most-discriminative words by the exporter);
  * words outside the frozen vocabulary score 0 (neutral), the standard
  * deployment behavior for out-of-vocabulary input. */
object StreamingQualityGate {

  /** Fixed-point NB score of one document: prior + Σ llr(word), words
    * absent from the model contributing 0. Shared with the parity spec. */
  def score(text: String, llr: scala.collection.Map[String, Long],
            priorFp: Long): (Int, Long) = {
    val tk = text.split(" ", -1)
    var s = priorFp
    var i = 0
    while (i < tk.length) { s += llr.getOrElse(tk(i), 0L); i += 1 }
    (tk.length, s)
  }

  def verdicts(docs: Dataset[SafetyDoc], llr: Map[String, Long],
               priorFp: Long): Dataset[QualityVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val m = spark.sparkContext.broadcast(llr)
    docs.map { d =>
      val (n, s) = score(d.text, m.value, priorFp)
      QualityVerdict(d.docId, n, s, s > 0)
    }
  }
}
