package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The composed streaming web-ingest DAG reproduces the batch
  * `web_ingest_dag` verdicts exactly on the real corpus: WARC gzip
  * archives stream in across micro-batches, and the folded per-doc
  * (n_lines, n_kept, keep) equals the batch rows. */
class WebIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stream == batch on sf0.001 across 3 archive micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Pipeline.queries("html_extract")(
      spark, "/root/testdata/sf0.001") // reuse the wrap+extract fixture
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // rebuild the SAME wrapped records the batch DAG builds, but keyed
    // by doc_id div 16 so archive order IS doc order — the batch
    // verdict is grouping-independent, the stream keeper is not
    val texts = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id", "text").as[(Long, String)].collect()
      .filter { case (_, t) =>
        t.nonEmpty && t.getBytes("UTF-8").length == t.length }
      .sortBy(_._1)
    val archives = texts.grouped(16).zipWithIndex.map { case (grp, i) =>
      val recs = grp.map { case (id, t) =>
        val html =
          s"""<html><head><title>Doc $id</title><style type="text/css">p { margin: 0; }</style><script type="text/javascript">if (1 < 2) { var s = "</p>"; }</script></head><body data-note="a > b"><h1>Header ${id % 10}</h1><!-- hidden <b>note</b> --><p>${graft.operators.HtmlText.escape(t)}</p></body></html>"""
        graft.operators.Warc.buildRecord(id,
          s"http://ex${id % 7}.com/doc/$id", html.getBytes("UTF-8"))
      }
      (i.toLong, graft.operators.Warc.buildArchive(recs, gzip = true))
    }.toSeq

    val mem = MemoryStream[(Long, Array[Byte])]
    val q = WebIngest.composedStream(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("web_ingest").start()
    try {
      val cuts = Seq(archives.size / 4, archives.size / 2, archives.size)
      var from = 0
      for (to <- cuts) {
        mem.addData(archives.slice(from, to): _*)
        q.processAllAvailable()
        from = to
      }
      val tokens = texts.map { case (id, t) =>
        id -> (4L + t.split(" ", -1).length) }.toMap
      val stream = spark.table("web_ingest").as[LineVerdict].collect()
        .groupBy(_.docId).map { case (id, vs) =>
          val nl = vs.length.toLong
          val nk = vs.count(_.kept).toLong
          id -> ((tokens(id), nl, nk, tokens(id) >= 24 && nk * 2 >= nl))
        }
      val batch = graft.Pipeline.queries("web_ingest_dag")(
        spark, "/root/testdata/sf0.001").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4)))).toMap
      assert(stream.size == batch.size && docs.length == batch.size)
      stream.foreach { case (id, v) =>
        assert(v == batch(id), s"doc $id: stream=$v batch=${batch(id)}")
      }
      assert(batch.values.exists(!_._4) && batch.values.exists(_._4),
        "verdict mix must be non-vacuous")
    } finally q.stop()
  }
}
