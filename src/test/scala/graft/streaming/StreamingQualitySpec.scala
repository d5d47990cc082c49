package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming quality gate: bit-exact stream/batch parity with the
  * `quality_classifier` query on the real sf0.001 corpus, plus the
  * out-of-vocabulary neutrality contract. */
class StreamingQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val B = 1000L * 1000000000L

  private def stream(docs: Seq[SafetyDoc], llr: Map[String, Long],
                     priorFp: Long): Map[Long, QualityVerdict] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SafetyDoc]
    val name = s"qv${System.nanoTime()}"
    val q = StreamingQualityGate.verdicts(mem.toDS(), llr, priorFp)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      spark.table(name).as[QualityVerdict].collect()
        .map(v => v.docId -> v).toMap
    } finally q.stop()
  }

  test("stream/batch parity: frozen model reproduces the batch scores") {
    import spark.implicits._
    val (llr, priorFp) = graft.Pipeline.nbFrozen(spark, dir)
    val corpus = graft.Tables.documents(spark, dir)
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toSeq
    val got = stream(corpus.map { case (id, t) => SafetyDoc(id, B, t) },
      llr, priorFp)
    val batch = graft.SparkEntry.queries("quality_classifier")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(batch.length == corpus.size && got.size == corpus.size)
    for ((id, nTok, score, pred) <- batch) {
      val v = got(id)
      assert(v.nTokens.toLong == nTok, s"doc $id token count")
      // the batch column is the fixed-point total rounded to 4 dp
      val streamScore = BigDecimal(v.scoreFp).setScale(-2,
        BigDecimal.RoundingMode.HALF_UP).toLong / 1e6
      assert(streamScore == score, s"doc $id score")
      assert(v.predRef == pred, s"doc $id decision")
    }
  }

  test("out-of-vocabulary words are neutral; empty-ish text gets the prior") {
    val llr = Map("good" -> 500000L, "bad" -> -700000L)
    val got = stream(Seq(
      SafetyDoc(1, B, "good xyzzy good"),   // 2 hits + 1 OOV
      SafetyDoc(2, B, "xyzzy plugh")),      // all OOV → prior decides
      llr, priorFp = -100000L)
    assert(got(1L) == QualityVerdict(1L, 3, 2 * 500000L - 100000L,
      predRef = true))
    assert(got(2L) == QualityVerdict(2L, 2, -100000L, predRef = false))
  }
}
