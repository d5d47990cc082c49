package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming seq-pack: running-offset state semantics, and exact
  * stream/batch parity with the `seq_pack` query on the real sf0.001
  * corpus under adversarial micro-batch slicing. */
class StreamingSeqPackSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("running offset carries across micro-batches; in-batch sort by id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PackDoc]
    val q = StreamingSeqPack.packStream(mem.toDS(), budget = 100L)
      .writeStream.outputMode("append")
      .format("memory").queryName("pack1").start()
    try {
      // batch 1 arrives OUT of id order: 60 + 30 tokens
      mem.addData(PackDoc("s", 2, 30), PackDoc("s", 1, 60))
      q.processAllAvailable()
      // batch 2: 50 tokens → starts at 90, spans the 100 boundary
      mem.addData(PackDoc("s", 3, 50))
      q.processAllAvailable()
      val got = spark.table("pack1").as[PackAssign].collect()
        .map(p => p.docId -> ((p.startOff, p.seqId, p.spansBoundary))).toMap
      assert(got(1L) == ((0L, 0L, false)))
      assert(got(2L) == ((60L, 0L, false)))
      assert(got(3L) == ((90L, 0L, true)))
    } finally q.stop()
  }

  test("stream/batch parity on the real corpus, adversarial slicing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("source", "doc_id AS docId",
        "CAST(size(split(text, ' ')) AS BIGINT) AS nTokens")
      .as[PackDoc].collect().toSeq.sortBy(_.docId)
    val mem = MemoryStream[PackDoc]
    val q = StreamingSeqPack.packStream(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("pack2").start()
    try {
      // ragged micro-batches (1, 2, 4, 8, ... docs) — per-source docId
      // order holds because the feed is globally docId-sorted
      var rest = docs
      var n = 1
      while (rest.nonEmpty) {
        val (batch, tail) = rest.splitAt(n)
        mem.addData(batch: _*)
        q.processAllAvailable()
        rest = tail
        n = math.min(n * 2, 64)
      }
      val got = spark.table("pack2")
        .selectExpr("source", "docId", "nTokens", "startOff", "seqId",
          "spansBoundary")
        .as[(String, Long, Long, Long, Long, Boolean)]
        .collect().toSeq.sortBy(_._2)
      val batch = graft.SparkEntry.queries("seq_pack")(
          spark, "/root/testdata/sf0.001")
        .selectExpr("source", "doc_id", "CAST(n_tokens AS BIGINT)",
          "start_off", "seq_id", "spans_boundary")
        .as[(String, Long, Long, Long, Long, Boolean)]
        .collect().toSeq.sortBy(_._2)
      assert(got == batch)
    } finally q.stop()
  }
}
