package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact dedup: verdict semantics (event-time keeper, replay
  * stability), the built-in kept-only form, and stream/batch agreement
  * on the real corpus fingerprints. */
class StreamingDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val S = 1000000000L
  private val B = 1000L * S

  test("verdict stream: event-time keeper, dups flagged, late re-admit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val out = StreamingDedup.verdictStream(mem.toDS(), ttlMs = 5000L,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("verdicts").start()
    try {
      // doc 2 arrives FIRST but doc 1 is earlier in EVENT time → keeper 1
      mem.addData(StreamDoc(2, B + 5 * S, 77L), StreamDoc(1, B, 77L),
        StreamDoc(3, B + 9 * S, 88L))
      q.processAllAvailable()
      // a later micro-batch dup of fp 77 flags against the settled keeper
      mem.addData(StreamDoc(4, B + 20 * S, 77L))
      q.processAllAvailable()
      val got = spark.table("verdicts").as[DedupVerdict].collect()
        .map(v => v.docId -> ((v.keeper, v.is_dup))).toMap
      assert(got(1L) == ((1L, false)))
      assert(got(2L) == ((1L, true)))
      assert(got(3L) == ((3L, false)))
      assert(got(4L) == ((1L, true)))
    } finally q.stop()
  }

  test("kept stream: dropDuplicatesWithinWatermark keeps one per fp") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val q = StreamingDedup.keptStream(mem.toDS(), "5 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("kept").start()
    try {
      mem.addData(StreamDoc(1, B, 77L), StreamDoc(2, B + S, 77L),
        StreamDoc(3, B + 2 * S, 88L))
      q.processAllAvailable()
      val kept = spark.table("kept").as[StreamDoc].collect()
      assert(kept.map(_.fp).sorted.toSeq == Seq(77L, 88L))
    } finally q.stop()
  }

  test("stream/batch agreement on real corpus fingerprints (sf0.001)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the batch dedup_exact compound key, collapsed to one long fp here
    // (poly_hash of text) — duplicates on this corpus are true dups
    graft.functions.PolyHash.register(spark)
    // synthetic increasing event time, seconds apart and well above
    // epoch 0 (ms-granular watermarks drop ts <= initial watermark 0)
    val base = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id AS docId",
        s"${B}L + doc_id * ${S}L AS tsNs",
        "poly_hash(text) AS fp")
      .as[StreamDoc].collect().toSeq
    // the corpus holds no exact text duplicates by construction, so model
    // the scenario streaming dedup exists for: an ingest REPLAY re-sends
    // a third of the documents under fresh ids at later event times
    val replayed = base.filter(_.docId % 3 == 0)
      .map(d => d.copy(docId = d.docId + 100000L,
        tsNs = d.tsNs + 3600L * S))
    val docs = base ++ replayed
    val batchKeeper = docs.groupBy(_.fp).flatMap { case (_, ds) =>
      val k = ds.minBy(d => (d.tsNs, d.docId)).docId
      ds.map(d => d.docId -> ((k, d.docId != k)))
    }.toMap

    val mem = MemoryStream[StreamDoc]
    val out = StreamingDedup.verdictStream(mem.toDS(),
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("corpusverdicts").start()
    try {
      mem.addData(docs)
      q.processAllAvailable()
      val got = spark.table("corpusverdicts").as[DedupVerdict].collect()
        .map(v => v.docId -> ((v.keeper, v.is_dup))).toMap
      assert(got == batchKeeper)
      assert(got.values.exists(_._2), "corpus should contain duplicates")
    } finally q.stop()
  }
}
