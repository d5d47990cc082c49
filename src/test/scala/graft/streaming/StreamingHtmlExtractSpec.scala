package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming HTML extraction: hostile pages through a real
  * MemoryStream run, plus exact stream/batch parity with the
  * `html_extract` query fixtures on the real sf0.001 corpus. */
class StreamingHtmlExtractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def stream(docs: Seq[HtmlDoc]): Map[Long, ExtractedDoc] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[HtmlDoc]
    val name = s"hx${System.nanoTime()}"
    val q = StreamingHtmlExtract.extract(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      spark.table(name).as[ExtractedDoc].collect()
        .map(d => d.docId -> d).toMap
    } finally q.stop()
  }

  test("hostile pages extract on the stream; ratio flags boilerplate") {
    val got = stream(Seq(
      HtmlDoc(1, 0, "<p>plain words here</p>"),
      HtmlDoc(2, 0, "<script>var a = '<p>leak</p>';</script><b>x</b>"),
      HtmlDoc(3, 0, "<nav><a href='/'>Home</a><a href='/x?a>b'>X</a>" +
        "</nav><!-- menu --><div></div>"),
      HtmlDoc(4, 0, "")))
    assert(got(1L).text == "plain words here" && got(1L).n_words == 3)
    assert(got(2L).text == "x")
    assert(got(3L).text == "Home X")
    // heavy-markup page: low extracted/raw ratio
    assert(got(3L).html_ratio_pct < 15)
    assert(got(4L).text == "" && got(4L).n_words == 0
      && got(4L).html_ratio_pct == 0)
  }

  test("stream/batch parity on the real corpus fixtures") {
    import spark.implicits._
    val batch = graft.Pipeline.queries("html_extract")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap
    val docs = graft.Tables.documents(spark, dir)
      .selectExpr("doc_id", "text").as[(Long, String)].collect()
      .filter { case (_, t) =>
        t.getBytes("UTF-8").length == t.length && t.nonEmpty }
      .map { case (id, t) =>
        HtmlDoc(id, 0,
          s"""<html><head><title>Doc $id</title><style type="text/css">p { margin: 0; }</style><script type="text/javascript">if (1 < 2) { var s = "</p>"; }</script></head><body data-note="a > b"><h1>Header ${id % 10}</h1><!-- hidden <b>note</b> --><p>${graft.operators.HtmlText.escape(t)}</p></body></html>""")
      }.toSeq
    val got = stream(docs)
    assert(got.size == batch.size && got.nonEmpty)
    for ((id, d) <- got)
      assert(batch(id) == ((d.text, d.n_chars, d.n_words)), s"doc $id")
  }
}
