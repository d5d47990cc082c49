package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming mixture quota gate: crafted quota behavior plus agreement
  * with the batch `mixture_sample` rates on the real sf0.001 corpus. */
class StreamingMixtureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val B = 1000L * 1000000000L

  private def stream(docs: Seq[MixtureDoc],
                     rates: Map[String, (Long, Long)])
      : Map[Long, MixtureVerdict] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[MixtureDoc]
    val name = s"mx${System.nanoTime()}"
    val q = StreamingMixture.verdicts(mem.toDS(), rates)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      // two micro-batches so the quota counter must survive in state
      val (b1, b2) = docs.splitAt(docs.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      spark.table(name).as[MixtureVerdict].collect()
        .map(v => v.docId -> v).toMap
    } finally q.stop()
  }

  test("quota caps a source across micro-batches; hash rule drops first") {
    // rate 1_000_000 ppm = every doc passes the hash rule; quota 3
    val docs = (1L to 8L).map(i => MixtureDoc(i, B + i, "s", s"doc $i"))
    val got = stream(docs, Map("s" -> (1000000L, 3L)))
    assert((1L to 3L).forall(got(_).kept))
    assert((4L to 8L).forall(i => !got(i).kept &&
      got(i).reason == "quota_drop"))
    // rate 0 ⇒ everything is a hash drop, quota never consulted
    val got0 = stream(docs.map(d => d.copy(docId = d.docId + 100)),
      Map("s" -> (0L, 3L)))
    assert(got0.values.forall(v => !v.kept && v.reason == "hash_drop"))
  }

  test("agrees with the batch mixture table on the real corpus") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rates = graft.SparkEntry.queries("mixture_sample")(spark, dir)
      .selectExpr("source", "rate_ppm", "k_target", "n_kept")
      .as[(String, Long, Long, Long)].collect()
    val rateMap = rates.map(r => r._1 -> ((r._2, r._3))).toMap
    val docs = graft.Tables.documents(spark, dir)
      .selectExpr("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
      .map { case (id, src, t) => MixtureDoc(id, B + id, src, t) }
    val got = stream(docs, rateMap)
    val keptBySrc = got.values.filter(_.kept).toSeq.groupBy(_.source)
      .map { case (s, vs) => s -> vs.size.toLong }
    for ((src, _, kTarget, nKept) <- rates) {
      // stream keeps exactly the batch's hash-passers, capped by quota
      assert(keptBySrc.getOrElse(src, 0L) == math.min(nKept, kTarget),
        s"source $src")
    }
    // and each stream-kept doc does pass the batch hash rule
    for (v <- got.values if v.kept) {
      val d = docs.find(_.docId == v.docId).get
      assert(StreamingMixture.hashPpm(d.text) < rateMap(d.source)._1)
    }
  }
}
