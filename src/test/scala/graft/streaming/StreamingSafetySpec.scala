package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming safety gate: crafted-verdict cases plus stream/batch parity
  * with the `pii_scrub`, `gopher_repetition` and `decontaminate` queries
  * on the real sf0.001 corpus. */
class StreamingSafetySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val B = 1000L * 1000000000L

  private def stream(docs: Seq[SafetyDoc],
                     evalGrams: Set[Long]): Map[Long, SafetyVerdict] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SafetyDoc]
    val name = s"sv${System.nanoTime()}"
    val q = StreamingSafetyGate.verdicts(mem.toDS(), evalGrams)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      spark.table(name).as[SafetyVerdict].collect()
        .map(v => v.docId -> v).toMap
    } finally q.stop()
  }

  test("crafted verdicts: pii, repetition, contamination, clean") {
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val got = stream(Seq(
      SafetyDoc(1, B, "write to me at bob@host.example or call +1-555-0199"),
      SafetyDoc(2, B, "spam spam spam spam spam spam"),
      SafetyDoc(3, B, "prefix " + evalText + " suffix"),
      SafetyDoc(4, B, "a perfectly ordinary clean sentence with value")),
      StreamingSafetyGate.gramHashes(evalText).toSet)
    assert(got(1L).nEmails == 1 && got(1L).nPhones == 1 && !got(1L).safe)
    assert(got(2L).repFlagged && !got(2L).safe)
    assert(got(3L).contaminated && !got(3L).safe)
    assert(got(4L) == SafetyVerdict(4L, 0, 0, 0, repFlagged = false,
      contaminated = false, safe = true))
  }

  test("stream/batch parity on the real corpus") {
    import spark.implicits._
    val corpus = graft.Tables.documents(spark, dir)
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toSeq
      .sortBy(_._1)
    // the batch pii_scrub injects PII by doc_id residue before scanning;
    // feed the stream the identical injected text
    def inject(id: Long, t: String): String = {
      val e = if (id % 3 == 0) s" contact user$id@mail.example.com" else ""
      val p = if (id % 4 == 1) s" call +1-555-${"%04d".format(id % 10000)}" else ""
      val i = if (id % 5 == 2) s" from 10.${id % 256}.0.1" else ""
      t + e + p + i
    }
    val evalGrams = corpus.filter(d =>
        d._1 % graft.Pipeline.EvalMod == graft.Pipeline.EvalRes &&
          d._1 <= graft.Pipeline.EvalMaxId)
      .flatMap(d => StreamingSafetyGate.gramHashes(d._2)).toSet

    // pass 1 — PII-injected text, the exact input batch pii_scrub scans
    val gotPii = stream(
      corpus.map { case (id, t) => SafetyDoc(id, B + id, inject(id, t)) },
      evalGrams)
    val pii = graft.SparkEntry.queries("pii_scrub")(spark, dir)
      .selectExpr("doc_id", "n_emails", "n_phones", "n_ips")
      .as[(Long, Long, Long, Long)].collect()
    for ((id, e, p, i) <- pii)
      assert((gotPii(id).nEmails.toLong, gotPii(id).nPhones.toLong,
        gotPii(id).nIps.toLong) == ((e, p, i)), s"pii $id")

    // pass 2 — raw text, the input the batch repetition/decontamination
    // queries scan (injection would perturb both rules' token streams)
    val gotRaw = stream(
      corpus.map { case (id, t) => SafetyDoc(id, B + id, t) }, evalGrams)
    val rep = graft.SparkEntry.queries("gopher_repetition")(spark, dir)
      .selectExpr("doc_id", "flagged").as[(Long, Boolean)].collect()
    for ((id, f) <- rep) assert(gotRaw(id).repFlagged == f, s"rep $id")

    val dec = graft.SparkEntry.queries("decontaminate")(spark, dir)
      .selectExpr("doc_id", "contaminated").as[(Long, Boolean)].collect()
    for ((id, c) <- dec) assert(gotRaw(id).contaminated == c, s"decontam $id")
  }
}
