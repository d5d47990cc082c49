package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming outlier gate: bit-exact stream/batch parity with the
  * `value_outliers` query on the real sf0.001 events, plus the
  * unknown-type pass-through contract. */
class StreamingOutlierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def stream(evs: Seq[ValueEvent],
                     th: Map[String, StreamingOutlierGate.TypeThresholds])
      : Seq[OutlierVerdict] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ValueEvent]
    val name = s"ov${System.nanoTime()}"
    val q = StreamingOutlierGate.verdicts(mem.toDS(), th)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      spark.table(name).as[OutlierVerdict].collect().toSeq
    } finally q.stop()
  }

  test("stream/batch parity: frozen thresholds reproduce batch flags") {
    import spark.implicits._
    val th = StreamingOutlierGate.frozen(spark, dir)
    val evs = graft.Tables.events(spark, dir)
      .selectExpr("event_id AS eventId", "event_type AS eventType",
        "CAST(round(value * 100) AS BIGINT) AS valueC")
      .as[ValueEvent].collect().toSeq
    val got = stream(evs, th)
    assert(got.size == evs.size)
    val batch = graft.SparkEntry.queries("value_outliers")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(3), r.getBoolean(4))).toMap
    // batch emits only flagged rows; the stream must flag exactly those
    for (v <- got) batch.get(v.eventId) match {
      case Some((zf, mf)) =>
        assert(v.zFlag == zf && v.madFlag == mf, s"event ${v.eventId}")
      case None =>
        assert(!v.zFlag && !v.madFlag, s"event ${v.eventId} over-flagged")
    }
    assert(got.count(v => v.zFlag || v.madFlag) == batch.size)
  }

  test("readings of an unknown type pass unflagged") {
    val th = StreamingOutlierGate.frozen(spark, dir)
    val got = stream(Seq(ValueEvent(1L, "reboot", 999999L)), th)
    assert(got == Seq(OutlierVerdict(1L, "reboot", 999999L,
      zFlag = false, madFlag = false)))
  }
}
