package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming politeness scheduler: gap enforcement, idle reset,
  * and exact parity with the batch closed-form schedule on the real
  * corpus across micro-batches. */
class PoliteSchedulerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("gap enforcement and idle catch-up on a crafted host") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FetchRequest]
    val q = PoliteScheduler.schedule(mem.toDS(), 1000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sched").start()
    try {
      // burst of three at t=0, then one long after the queue drains
      mem.addData(FetchRequest(1, "h", 0), FetchRequest(2, "h", 0),
        FetchRequest(3, "h", 100))
      q.processAllAvailable()
      mem.addData(FetchRequest(4, "h", 50000))
      q.processAllAvailable()
      val got = spark.table("sched").as[ScheduledFetch].collect()
        .map(s => s.docId -> s.schedMs).toMap
      assert(got == Map(1L -> 0L, 2L -> 1000L, 3L -> 2000L,
        4L -> 50000L)) // idle host: no residual delay
    } finally q.stop()
  }

  test("stream == batch closed form on sf0.001 across 3 micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val reqs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id",
        "concat('ex', doc_id % 7, '.com') AS host_key",
        "(doc_id div 7) * 800 + (length(text) % 400) AS t_ms")
      .as[(Long, String, Long)].collect()
      .map(r => FetchRequest(r._1, r._2, r._3))
      .sortBy(r => (r.tMs, r.docId)).toSeq
    val mem = MemoryStream[FetchRequest]
    val q = PoliteScheduler.schedule(mem.toDS(),
      graft.Pipeline.CrawlDelayMs)
      .writeStream.outputMode("append")
      .format("memory").queryName("sched_corpus").start()
    try {
      val cuts = Seq(reqs.size / 3, reqs.size / 2, reqs.size)
      var from = 0
      for (to <- cuts) {
        mem.addData(reqs.slice(from, to): _*)
        q.processAllAvailable()
        from = to
      }
      val stream = spark.table("sched_corpus").as[ScheduledFetch]
        .collect().map(s => s.docId -> ((s.schedMs, s.delayMs))).toMap
      val batch = graft.Pipeline.queries("polite_schedule")(
        spark, "/root/testdata/sf0.001").collect()
        .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
      assert(stream.size == batch.size)
      stream.foreach { case (id, v) =>
        assert(v == batch(id), s"doc $id: stream=$v batch=${batch(id)}")
      }
    } finally q.stop()
  }
}
