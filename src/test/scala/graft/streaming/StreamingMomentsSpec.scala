package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming moments accumulator reproduces the batch
  * embedding_covariance rows exactly after an arbitrary micro-batch
  * split, and the fold is order-insensitive (mergeable-by-addition). */
class StreamingMomentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("foreachBatch fold across 3 triggers == batch covariance") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the batch query's own quantization (SQL round semantics)
    val quant = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("vec_id",
        "transform(cast(embedding AS array<double>), " +
          "x -> CAST(round(x * 1000) AS BIGINT)) AS q")
      .orderBy("vec_id").as[(Long, Seq[Long])].collect().map(_._2).toSeq

    var acc = StreamingMoments.empty
    val mem = MemoryStream[Seq[Long]]
    val q = mem.toDS().writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Seq[Long]], _: Long) =>
        acc = StreamingMoments.merge(acc, StreamingMoments.batchMoments(df))
      }.start()
    try {
      val cuts = Seq(quant.size / 3, 2 * quant.size / 3, quant.size)
      var from = 0
      for (to <- cuts) {
        mem.addData(quant.slice(from, to): _*)
        q.processAllAvailable()
        from = to
      }
    } finally q.stop()

    val got = StreamingMoments.covMicro(acc)
      .map { case (i, j, c) => (i, j) -> c }.toMap
    val batch = graft.Pipeline.queries("embedding_covariance")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == 2080 && batch.size == 2080)
    assert(got == batch)

    // mergeability: reversed fold order lands on the same state
    val parts = Seq(quant.take(100), quant.slice(100, 300),
      quant.drop(300)).map(p => StreamingMoments.of(p.iterator))
    val fwd = parts.foldLeft(StreamingMoments.empty)(StreamingMoments.merge)
    val rev = parts.reverse.foldLeft(
      StreamingMoments.empty)(StreamingMoments.merge)
    assert(fwd == rev && fwd.n == quant.size.toLong)
  }
}
