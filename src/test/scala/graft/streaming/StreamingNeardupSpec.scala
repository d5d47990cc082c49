package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming LSH admission gate replayed over the real corpus in
  * adversarial micro-batch slices must agree with the batch banding
  * semantics exactly: per-bucket anchors are the first-seen docIds,
  * a doc is a candidate iff some band bucket was seen earlier, and
  * every batch-VERIFIED near-dup pair's later doc is flagged (LSH
  * admits supersets — it must never miss a verified pair). */
class StreamingNeardupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("replayed gate equals batch banding; verified pairs all flagged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val p = graft.Pipeline.P
    graft.functions.PolyHash.register(spark)
    graft.functions.PolyHashWindows.register(spark)
    graft.functions.MinHashSig.register(spark)
    // the batch pipeline's shingle → minhash16 → 2×8 band fold,
    // verbatim SQL (Pipeline.minhashLsh's candidate front)
    val tk = "transform(split(text, ' '), t -> poly_hash(t))"
    val bands = graft.Tables.documents(spark, dir)
      .selectExpr("doc_id", s"$tk AS tk")
      .selectExpr("doc_id",
        s"sort_array(array_distinct(transform(" +
          s"${graft.Pipeline.shingleIdx("tk")}, " +
          s"i -> ((element_at(tk, cast(i AS int)) * 31 " +
          s"+ element_at(tk, cast(i + 1 AS int))) % $p * 31 " +
          s"+ element_at(tk, cast(i + 2 AS int))) % $p))) AS th")
      .selectExpr("doc_id", "minhash16(th) AS sig")
      .selectExpr("doc_id",
        s"explode(transform(sequence(0, 1), b -> struct(b AS band, " +
          s"aggregate(slice(sig, cast(b * 8 + 1 AS int), 8), 0L, " +
          s"(a, x) -> (a * 31 + x) % $p) AS bv))) AS e")
      .selectExpr("doc_id", "e.band AS band", "e.bv AS bv")
      .as[(Long, Int, Long)].collect().toSeq.sortBy(_._1)
    val obs = bands.map { case (id, b, bv) => BandObs(id, id, b, bv) }

    val mem = MemoryStream[BandObs]
    val name = s"nd${System.nanoTime()}"
    val q = StreamingNeardup.verdictStream(mem.toDS(),
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout
          .NoTimeout)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    val verdicts = try {
      val cuts = Seq(0, 1, 17, obs.size / 3, obs.size / 2, obs.size)
      for (Seq(a, b) <- cuts.sliding(2)) {
        mem.addData(obs.slice(a, b): _*)
        q.processAllAvailable()
      }
      spark.table(name)
        .as[NeardupVerdict].collect().toSeq
    } finally q.stop()

    // every observation got exactly one verdict
    assert(verdicts.size == obs.size)

    // reference anchors: min docId per bucket (replay is in docId
    // order, so first-seen == min)
    val refAnchor = bands.groupBy(r => (r._2, r._3))
      .map { case (k, rs) => k -> rs.map(_._1).min }
    for (v <- verdicts) {
      assert(v.anchor == refAnchor((v.band, v.bv)),
        s"anchor mismatch at doc ${v.docId} band ${v.band}")
      assert(v.is_candidate == (v.docId != v.anchor),
        s"candidate flag at doc ${v.docId}")
    }

    // per-doc disjunction equals the batch "shares a bucket with an
    // earlier doc" semantics
    val flagged = verdicts.filter(_.is_candidate).map(_.docId).toSet
    val refFlagged = bands
      .filter { case (id, b, bv) => refAnchor((b, bv)) < id }
      .map(_._1).toSet
    assert(flagged == refFlagged)

    // completeness against the VERIFIED batch pairs: minhash_lsh's
    // output (J >= 0.5 after exact verify) — the later doc of every
    // pair must be a streamed candidate
    val pairs = graft.SparkEntry.queries("minhash_lsh")(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "corpus has no verified near-dup pairs")
    for ((a, b) <- pairs)
      assert(flagged.contains(math.max(a, b)),
        s"verified pair ($a, $b) missed by the stream gate")
  }
}
