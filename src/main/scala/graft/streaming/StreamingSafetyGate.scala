package graft.streaming

import graft.functions.PolyHash
import org.apache.spark.sql.Dataset

/** One document on the ingest safety stream. */
case class SafetyDoc(docId: Long, tsNs: Long, text: String)

/** Safety verdict — the streaming counterpart of the batch
  * `pii_scrub` counts, the `gopher_repetition` flag and the
  * `decontaminate` verdict, collapsed into one gate row. */
case class SafetyVerdict(docId: Long, nEmails: Int, nPhones: Int, nIps: Int,
                         repFlagged: Boolean, contaminated: Boolean,
                         safe: Boolean)

/** Streaming twin of the corpus-safety family: PII detection, the
  * Gopher repetition rules and eval-set decontamination evaluated on
  * the ingest stream, so unsafe documents never reach the lake at all
  * (the batch queries are the audit pass; this is the gate).
  *
  * Everything here is STATELESS per row — a pure map, append mode, no
  * watermark, no shuffle: the only cross-document input, the eval gram
  * set, is benchmark-sized by construction and rides a broadcast
  * variable exactly like the batch plan's broadcast hash join. The
  * plain-Scala rule mirrors below are shared with the parity spec,
  * which pins them against the batch SQL on the real corpus. */
object StreamingSafetyGate {

  /** Same escape-free patterns as the batch `pii_scrub` (java.util.regex
    * there too, so the engines agree by construction). */
  private val EmailRe = "[a-z0-9]+@[a-z0-9.]+".r
  private val PhoneRe = "[+]1-555-[0-9]{4}".r
  private val IpRe = "10[.][0-9]{1,3}[.]0[.]1".r

  def piiCounts(text: String): (Int, Int, Int) =
    (EmailRe.findAllIn(text).size, PhoneRe.findAllIn(text).size,
      IpRe.findAllIn(text).size)

  /** The `gopher_repetition` flag: chars under the top REPEATED 2-gram
    * over total chars > 0.12, or any duplicated 3-gram. Sort-and-count
    * runs, O(n log n) per document — the same shape as the batch plan's
    * sorted-array fold (a naive count-in-place scan is n² and melts on
    * long real-world documents). */
  def repetitionFlagged(text: String): Boolean = {
    val tk = text.split(" ", -1)
    val sg2 = tk.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      .toArray.sorted
    var top2 = 0L
    var run = 1
    var i = 1
    while (i < sg2.length) {
      if (sg2(i) == sg2(i - 1)) {
        run += 1
        top2 = math.max(top2, run.toLong * sg2(i).length)
      } else run = 1
      i += 1
    }
    val sg3 = tk.sliding(3).filter(_.length == 3).map(_.mkString(" "))
      .toArray.sorted
    val dup3 = sg3.indices.count(j =>
      (j > 0 && sg3(j) == sg3(j - 1)) ||
        (j < sg3.length - 1 && sg3(j) == sg3(j + 1)))
    top2.toDouble / math.max(text.length, 1) > 0.12 || dup3 > 0
  }

  /** DecontN-token gram hashes, the batch `decontaminate` key:
    * poly_hash of the space-joined token window. */
  def gramHashes(text: String): Seq[Long] = {
    val tk = text.split(" ", -1)
    tk.sliding(graft.Pipeline.DecontN)
      .filter(_.length == graft.Pipeline.DecontN)
      .map(w => PolyHash.hashBytes(w.mkString(" ").getBytes("UTF-8")))
      .toSeq
  }

  /** Gate the stream. `evalGrams` is the eval set's distinct gram-hash
    * set — tiny by construction (a benchmark, not a corpus), so it
    * broadcasts; the corpus side stays a stateless map. */
  def verdicts(docs: Dataset[SafetyDoc],
               evalGrams: Set[Long]): Dataset[SafetyVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ev = spark.sparkContext.broadcast(evalGrams)
    docs.map { d =>
      val (e, p, i) = piiCounts(d.text)
      val rep = repetitionFlagged(d.text)
      val contaminated = gramHashes(d.text).exists(ev.value.contains)
      SafetyVerdict(d.docId, e, p, i, rep, contaminated,
        e + p + i == 0 && !rep && !contaminated)
    }
  }
}
