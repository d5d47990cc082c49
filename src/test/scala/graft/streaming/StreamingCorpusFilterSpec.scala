package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming corpus filter: dup-beats-stateless-rules priority, replay
  * verdict stability, and stream/batch parity with the `corpus_filter`
  * query on the real sf0.001 corpus. */
class StreamingCorpusFilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val S = 1000000000L
  private val B = 1000L * S

  private val good =
    "the data table row scan join filter sort merge batch stream " +
      "query window spark plan shuffle broadcast partition codegen " +
      "parquet column predicate pushdown executor driver stage task"

  test("duplicate rule wins over stateless reasons; replays stay stable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FilterDoc]
    val q = StreamingCorpusFilter.verdicts(mem.toDS(),
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.outputMode("append")
      .format("memory").queryName("cfv").start()
    try {
      mem.addData(
        FilterDoc(1, B, good, "en"),
        FilterDoc(2, B + S, good, "en"),          // dup of 1
        FilterDoc(3, B + 2 * S, good, "zh"),      // lang... but ALSO dup of 1
        FilterDoc(4, B + 3 * S, "tiny", "en"))    // too_short
      q.processAllAvailable()
      // later batch: another dup flags against the settled keeper
      mem.addData(FilterDoc(5, B + 9 * S, good, "en"))
      q.processAllAvailable()
      val got = spark.table("cfv").as[FilterVerdict].collect()
        .map(v => v.docId -> ((v.keep, v.reason))).toMap
      assert(got(1L) == ((true, "keep")))
      assert(got(2L) == ((false, "duplicate")))
      assert(got(3L) == ((false, "duplicate"))) // dup outranks lang
      assert(got(4L) == ((false, "too_short")))
      assert(got(5L) == ((false, "duplicate")))
    } finally q.stop()
  }

  test("out-of-order ingest: keeper is first-seen by EVENT time, not min id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FilterDoc]
    val q = StreamingCorpusFilter.verdicts(mem.toDS(),
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.outputMode("append")
      .format("memory").queryName("cfo").start()
    try {
      // the HIGHER id carries the EARLIER event time: the stream must
      // elect it (causal first-seen), where the batch pass would
      // canonicalize to min(doc_id) — the documented, deliberate
      // divergence under out-of-order arrival
      mem.addData(FilterDoc(7, B, good, "en"))
      q.processAllAvailable()
      mem.addData(FilterDoc(3, B + S, good, "en"))
      q.processAllAvailable()
      val got = spark.table("cfo").as[FilterVerdict].collect()
        .map(v => v.docId -> ((v.keep, v.reason))).toMap
      assert(got(7L) == ((true, "keep")))
      assert(got(3L) == ((false, "duplicate")))
    } finally q.stop()
  }

  test("stream/batch parity on the real corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id", "text", "lang").as[(Long, String, String)]
      .collect().toSeq.sortBy(_._1)
      .map { case (id, t, l) => FilterDoc(id, B + id * S, t, l) }
    val mem = MemoryStream[FilterDoc]
    val q = StreamingCorpusFilter.verdicts(mem.toDS(),
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.outputMode("append")
      .format("memory").queryName("cfp").start()
    try {
      val (h, t) = docs.splitAt(docs.size / 2)
      mem.addData(h: _*); q.processAllAvailable()
      mem.addData(t: _*); q.processAllAvailable()
      val got = spark.table("cfp").as[FilterVerdict].collect()
        .map(v => (v.docId, v.keep, v.reason)).toSeq.sortBy(_._1)
      val batch = graft.SparkEntry.queries("corpus_filter")(
          spark, "/root/testdata/sf0.001")
        .as[(Long, Boolean, String)].collect().toSeq.sortBy(_._1)
      assert(got == batch)
      assert(got.exists(!_._2) && got.exists(_._2))
    } finally q.stop()
  }
}
