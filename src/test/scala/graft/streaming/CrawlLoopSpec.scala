package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The full streaming crawler loop — frontier (canonicalize + robots +
  * first-discovery dedup) chained into the politeness scheduler as two
  * standing queries — reproduces the batch `crawl_schedule` exactly on
  * the real corpus. Two stateful operators cannot share one query, so
  * the loop runs as a chain (the microservice shape a crawler actually
  * deploys): stage-1 verdicts pump stage-2 requests micro-batch by
  * micro-batch. */
/** One sitemap document on the discovery stream. */
case class SitemapDoc(docId: Long, xml: String)

class CrawlLoopSpec extends AnyFunSuite {

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

  test("frontier -> scheduler chain == batch crawl_schedule on sf0.001") {
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

    val urlsIn = MemoryStream[DiscoveredUrl]
    val q1 = CrawlFrontier.verdictStream(urlsIn.toDS(), robotsTxt,
      "graftbot/1.0")
      .writeStream.outputMode("append")
      .format("memory").queryName("loop_frontier").start()
    val reqsIn = MemoryStream[FetchRequest]
    val q2 = PoliteScheduler.schedule(reqsIn.toDS(),
      graft.Pipeline.CrawlDelayMs)
      .writeStream.outputMode("append")
      .format("memory").queryName("loop_sched").start()
    try {
      // micro-batches cut at 7-doc HOST-CYCLE boundaries: every host's
      // desired times in block b (t in [800b, 800b+100]) precede every
      // time in block b+1, so the cross-batch scheduler feed stays
      // monotone per host and the append-only tail pump is sound
      val blocks = discovered.groupBy(_.docId / 7).toSeq.sortBy(_._1)
        .map(_._2.sortBy(u => (u.docId, u.variant)))
      val batches = Seq(
        blocks.take(blocks.size / 3),
        blocks.slice(blocks.size / 3, 2 * blocks.size / 3),
        blocks.drop(2 * blocks.size / 3)).map(_.flatten)
      var pumped = 0
      for (batch1 <- batches) {
        urlsIn.addData(batch1: _*)
        q1.processAllAvailable()
        // pump the NEW fetchable verdicts into the scheduler stage,
        // in the same (t, doc, variant) discovery order
        val fetches = spark.table("loop_frontier").as[FrontierVerdict]
          .collect().filter(_.fetch)
          .map(v => FetchRequest(v.docId * 4 + v.variant,
            s"ex${v.docId % 7}.com",
            (v.docId / 7) * 800 + v.variant * 50))
          .sortBy(r => (r.tMs, r.docId))
        val fresh = fetches.drop(pumped min fetches.length)
        // verdicts are append-only and discovery order is monotone, so
        // the new tail IS the next micro-batch
        reqsIn.addData(fresh.toSeq: _*)
        q2.processAllAvailable()
        pumped = fetches.length
      }
      val stream = spark.table("loop_sched").as[ScheduledFetch].collect()
        .map(s => (s.docId / 4, s.docId % 4) -> s.schedMs).toMap
      val batch = graft.Pipeline.queries("crawl_schedule")(
        spark, "/root/testdata/sf0.001").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
      assert(stream.size == batch.size)
      stream.foreach { case (kx, s) =>
        assert(s == batch(kx), s"$kx: stream=$s batch=${batch(kx)}")
      }
      assert(batch.nonEmpty)
    } finally { q1.stop(); q2.stop() }
  }

  test("sitemap -> frontier -> scheduler chain == batch crawl_loop_sitemap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // stage 0 input: the crawl_loop_sitemap fixture's per-doc urlset
    val sitemaps = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id", "length(text) AS len").as[(Long, Long)]
      .collect().sortBy(_._1)
      .map { case (id, len) =>
        val k = id % 7
        val m = len % 5
        val m2 = (m + 1) % 5
        val q = len % 9
        SitemapDoc(id,
          s"""<?xml version="1.0" encoding="UTF-8"?>
             |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
             |<url><loc>http://ex$k.com/Dir$m/page?b=$q&amp;a=1</loc></url>
             |<url><loc>HTTP://Ex$k.COM:80/Dir$m/./page?a=1&amp;b=$q</loc></url>
             |<url><loc>http://ex$k.com/Dir$m2/page?a=1&amp;b=$q</loc></url>
             |</urlset>""".stripMargin)
      }

    val docsIn = MemoryStream[SitemapDoc]
    // DISCOVERY composes into the frontier's standing query: the
    // urlset parse is a stateless flatMap ahead of the keeper state
    val discovered = docsIn.toDS().flatMap { d =>
      graft.operators.Sitemap.parseUrlset(d.xml).zipWithIndex.map {
        case (u, i) => DiscoveredUrl(d.docId, i.toLong, u.loc) }
    }
    val q1 = CrawlFrontier.verdictStream(discovered, robotsTxt,
      "graftbot/1.0")
      .writeStream.outputMode("append")
      .format("memory").queryName("smloop_frontier").start()
    val reqsIn = MemoryStream[FetchRequest]
    val q2 = PoliteScheduler.schedule(reqsIn.toDS(),
      graft.Pipeline.CrawlDelayMs)
      .writeStream.outputMode("append")
      .format("memory").queryName("smloop_sched").start()
    try {
      val blocks = sitemaps.groupBy(_.docId / 7).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_.docId))
      val batches = Seq(
        blocks.take(blocks.size / 3),
        blocks.slice(blocks.size / 3, 2 * blocks.size / 3),
        blocks.drop(2 * blocks.size / 3)).map(_.flatten)
      var pumped = 0
      for (b <- batches) {
        docsIn.addData(b: _*)
        q1.processAllAvailable()
        val fetches = spark.table("smloop_frontier").as[FrontierVerdict]
          .collect().filter(_.fetch)
          .map(v => FetchRequest(v.docId * 4 + v.variant,
            s"ex${v.docId % 7}.com",
            (v.docId / 7) * 800 + v.variant * 50))
          .sortBy(r => (r.tMs, r.docId))
        val fresh = fetches.drop(pumped min fetches.length)
        reqsIn.addData(fresh.toSeq: _*)
        q2.processAllAvailable()
        pumped = fetches.length
      }
      val stream = spark.table("smloop_sched").as[ScheduledFetch].collect()
        .map(s => (s.docId / 4, s.docId % 4) -> s.schedMs).toMap
      val batch = graft.Pipeline.queries("crawl_loop_sitemap")(
        spark, "/root/testdata/sf0.001").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
      assert(stream.size == batch.size)
      stream.foreach { case (kx, s) =>
        assert(s == batch(kx), s"$kx: stream=$s batch=${batch(kx)}")
      }
      assert(batch.nonEmpty)
    } finally { q1.stop(); q2.stop() }
  }
}
