package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming line-level dedup: keeper settles in (docId, lineNo) order
  * inside a micro-batch, holds across micro-batches, and a
  * doc_id-ordered replay of the real corpus reproduces the batch
  * `line_dedup` rows exactly — any micro-batching. */
class StreamingLineDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunker matches the batch 3-word rule incl. trailing empties") {
    import spark.implicits._
    val out = StreamingLineDedup.explodeLines(
      Seq((1L, "a b c d"), (2L, "x"), (3L, "")).toDS()).collect()
      .groupBy(_.docId).view.mapValues(_.sortBy(_.lineNo).map(_.line).toSeq)
      .toMap
    assert(out(1L) == Seq("a b c", "d"))
    assert(out(2L) == Seq("x"))
    assert(out(3L) == Seq("")) // split('', -1) = [''] on both sides
  }

  test("keeper settles by (docId, lineNo) in-batch and holds across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamLine]
    val q = StreamingLineDedup.verdictStream(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("lv").start()
    try {
      // arrival order deliberately scrambled: (5,0) arrives before (2,1)
      mem.addData(StreamLine(5, 0, "a b c"), StreamLine(2, 1, "a b c"),
        StreamLine(2, 0, "x y z"))
      q.processAllAvailable()
      // later batch: same line again → flagged against the settled keeper
      mem.addData(StreamLine(9, 3, "a b c"))
      q.processAllAvailable()
      val got = spark.table("lv").as[LineVerdict].collect()
        .map(v => (v.docId, v.lineNo) -> ((v.keeperDoc, v.keeperLine, v.kept)))
        .toMap
      assert(got((2L, 1L)) == ((2L, 1L, true)))  // lowest (doc, line) wins
      assert(got((5L, 0L)) == ((2L, 1L, false)))
      assert(got((2L, 0L)) == ((2L, 0L, true)))
      assert(got((9L, 3L)) == ((2L, 1L, false)))
    } finally q.stop()
  }

  test("doc_id-ordered replay reproduces batch line_dedup exactly (sf0.001)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    val mem = MemoryStream[(Long, String)]
    val q = StreamingLineDedup.verdictStream(
      StreamingLineDedup.explodeLines(mem.toDS()))
      .writeStream.outputMode("append")
      .format("memory").queryName("lv_corpus").start()
    try {
      // three uneven micro-batches in doc_id order
      val cuts = Seq(docs.size / 5, docs.size / 2, docs.size)
      var from = 0
      for (to <- cuts) {
        mem.addData(docs.slice(from, to): _*)
        q.processAllAvailable()
        from = to
      }
      val streamPerDoc = spark.table("lv_corpus").as[LineVerdict].collect()
        .groupBy(_.docId).map { case (id, vs) =>
          val kept = vs.filter(_.kept).sortBy(_.lineNo).map(_.line)
          id -> ((vs.length.toLong, kept.length.toLong,
            md5hex(kept.mkString("\n"))))
        }
      val batch = graft.Pipeline.queries("line_dedup")(
        spark, "/root/testdata/sf0.001").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getString(3)))).toMap
      assert(streamPerDoc.size == batch.size)
      streamPerDoc.foreach { case (id, v) =>
        assert(v == batch(id), s"doc $id diverged: stream=$v batch=${batch(id)}")
      }
    } finally q.stop()
  }
}
