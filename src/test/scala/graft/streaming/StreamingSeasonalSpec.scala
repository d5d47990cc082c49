package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming seasonal gate: bit-exact stream/batch parity with the
  * `seasonal_anomaly` query on the real sf0.001 events (final cell
  * verdicts across multiple micro-batches), plus the unknown-hour
  * pass-through contract. */
class StreamingSeasonalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def run(batches: Seq[Seq[CellEvent]],
                  prof: Map[(String, Long), StreamingSeasonalGate.HourProfile])
      : Map[(String, Long, Long), (Long, Boolean)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CellEvent]
    val name = s"sg${System.nanoTime()}"
    val q = StreamingSeasonalGate.statuses(mem.toDS(), prof)
      .writeStream.outputMode("update").format("memory").queryName(name)
      .start()
    try {
      for (b <- batches) { mem.addData(b: _*); q.processAllAvailable() }
      // last update per cell = final running count + verdict
      spark.table(name).as[CellStatus].collect()
        .groupBy(c => (c.eventType, c.day, c.hour))
        .map { case (k, vs) =>
          k -> { val m = vs.maxBy(_.cnt); (m.cnt, m.anomaly) } }
    } finally q.stop()
  }

  test("stream/batch parity: frozen profile reproduces batch cell flags") {
    import spark.implicits._
    val prof = StreamingSeasonalGate.frozen(spark, dir)
    val evs = graft.Tables.events(spark, dir)
      .selectExpr("event_type AS eventType",
        "ts div 86400000000000 AS day",
        "(ts div 3600000000000) % 24 AS hour")
      .as[CellEvent].collect().toSeq
    // split into 3 micro-batches to exercise the running state
    val got = run(evs.grouped(math.max(1, evs.size / 3 + 1)).toSeq, prof)
    val flagged = graft.SparkEntry.queries("seasonal_anomaly")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(flagged.nonEmpty, "batch flagged no cells — vacuous parity")
    for ((k, cnt) <- flagged) {
      val (c, a) = got(k)
      assert(c == cnt && a, s"cell $k: stream ($c, $a) vs batch count $cnt")
    }
    assert(got.count(_._2._2) == flagged.size,
      "stream flagged cells batch did not")
  }

  test("cells of an unseen (type, hour) pass unflagged") {
    val got = run(Seq(Seq(CellEvent("nosuch", 1L, 3L))),
      StreamingSeasonalGate.frozen(spark, dir))
    assert(got(("nosuch", 1L, 3L)) == ((1L, false)))
  }
}
