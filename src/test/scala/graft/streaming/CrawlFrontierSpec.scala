package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming crawl frontier reproduces the batch `crawl_frontier`
  * verdicts exactly on the real corpus replayed in discovery order
  * across micro-batches. */
class CrawlFrontierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val robotsTxt =
    """User-agent: *
      |Disallow: /Dir2
      |Disallow: /Dir4
      |User-agent: GraftBot
      |Disallow: /Dir1
      |Disallow: /Dir3
      |Allow: /Dir3/pa*e$""".stripMargin

  test("stream == batch on sf0.001 across 3 discovery micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val discovered = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id", "text").as[(Long, String)].collect()
      .filter { case (_, t) =>
        t.nonEmpty && t.getBytes("UTF-8").length == t.length }
      .sortBy(_._1)
      .flatMap { case (id, t) =>
        val port = if (id % 2 == 0) ":80" else ":8080"
        val k = id % 7
        val m = t.length % 5
        val q = t.length % 9
        Seq(
          DiscoveredUrl(id, 0L, s"HTTP://WWW.Ex$k.COM$port/Dir$m" +
            s"/./skip/../p%61ge?utm_campaign=c&b=$q&a=1#top"),
          DiscoveredUrl(id, 1L,
            s"http://www.ex$k.com$port/Dir$m/page?a=1&b=$q&utm_source=z"),
          DiscoveredUrl(id, 2L,
            s"http://www.ex$k.com$port/Dir$m/page2?a=1&b=$q"))
      }.toSeq

    val mem = MemoryStream[DiscoveredUrl]
    val q = CrawlFrontier.verdictStream(mem.toDS(), robotsTxt,
      "graftbot/1.0")
      .writeStream.outputMode("append")
      .format("memory").queryName("frontier").start()
    try {
      val cuts = Seq(discovered.size / 3, discovered.size / 2,
        discovered.size)
      var from = 0
      for (to <- cuts) {
        mem.addData(discovered.slice(from, to): _*)
        q.processAllAvailable()
        from = to
      }
      val stream = spark.table("frontier").as[FrontierVerdict].collect()
        .map(v => (v.docId, v.variant) ->
          ((v.canon, v.allowed, v.isDup, v.fetch))).toMap
      val batch = graft.Pipeline.queries("crawl_frontier")(
        spark, "/root/testdata/sf0.001").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2),
          r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))).toMap
      assert(stream.size == batch.size)
      stream.foreach { case (kx, v) =>
        assert(v == batch(kx), s"$kx: stream=$v batch=${batch(kx)}")
      }
      // all four verdict classes present
      assert(batch.values.exists(v => v._2 && v._4))
      assert(batch.values.exists(v => v._2 && v._3))
      assert(batch.values.exists(v => !v._2 && !v._3))
      assert(batch.values.exists(v => !v._2 && v._3))
    } finally q.stop()
  }
}
