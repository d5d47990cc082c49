package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The live CUSUM monitor replayed over the real corpus's sealed day
  * counts (day-ordered per type, adversarial micro-batch cuts) must
  * emit exactly the batch `cusum_shift` chart — the frozen-reference
  * train/score split preserving bit-equality on the training window. */
class StreamingCusumSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("replayed chart points equal the batch cusum_shift bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val refs = StreamingCusum.frozen(spark, dir)
    assert(refs.nonEmpty)
    // sealed day counts, globally day-ordered (so per-type order holds
    // across any batch cut — the upstream watermark contract)
    val counts = graft.Tables.events(spark, dir)
      .selectExpr("event_type",
        s"ts div ${graft.Analytics.NsPerDay}L AS day")
      .groupBy("event_type", "day")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("x"))
      .collect().map(r => DayCount(r.getString(0), r.getLong(1),
        r.getLong(2)))
      .sortBy(d => (d.day, d.eventType)).toSeq

    val mem = MemoryStream[DayCount]
    val name = s"cu${System.nanoTime()}"
    val q = StreamingCusum.chartStream(mem.toDS(), refs)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    val got = try {
      val cuts = Seq(0, 1, 3, 40, counts.size / 2, counts.size)
      for (Seq(a, b) <- cuts.sliding(2)) {
        mem.addData(counts.slice(a, b): _*)
        q.processAllAvailable()
      }
      spark.table(name)
        .as[(String, Long, Long, Long, Long, Boolean, Boolean)]
        .collect().toSeq.sortBy(r => (r._1, r._2))
    } finally q.stop()

    val batch = graft.SparkEntry.queries("cusum_shift")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
      .toSeq
    assert(batch.nonEmpty)
    assert(got == batch)
  }
}
