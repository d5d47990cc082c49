package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming value-histogram state replayed over the real corpus in
  * adversarial micro-batch slices must reproduce the batch
  * `quantile_sketch` rows exactly — the mergeable-by-addition claim,
  * executed. */
class StreamingQuantileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("replayed histogram state reproduces the batch sketch rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT)")
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
      .map { case (id, n) => QuantDoc(id, n) }

    val mem = MemoryStream[QuantDoc]
    val name = s"qh${System.nanoTime()}"
    val q = StreamingQuantile.histogramStream(mem.toDS())
      .writeStream.outputMode("update").format("memory").queryName(name)
      .start()
    val hist = try {
      // uneven slices incl. a singleton and an empty-progress tail so
      // counts must accumulate across triggers, not within one batch
      val cuts = Seq(0, 7, 8, 23, docs.size / 2, docs.size)
      for (Seq(a, b) <- cuts.sliding(2)) {
        mem.addData(docs.slice(a, b): _*)
        q.processAllAvailable()
      }
      // update mode: the LAST emitted row per value is the live count
      spark.table(name).as[(Long, Long)].collect()
        .zipWithIndex
        .groupBy(_._1._1)
        .map { case (x, rows) => x -> rows.maxBy(_._2)._1._2 }
    } finally q.stop()

    assert(hist.values.sum == docs.size, "histogram mass = corpus size")
    val got = StreamingQuantile.quantiles(
      hist, Seq(500000L, 900000L, 990000L), graft.Pipeline.QsBins)
    val want = graft.SparkEntry.queries("quantile_sketch")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want, s"\n got: $got\nwant: $want")
  }
}
