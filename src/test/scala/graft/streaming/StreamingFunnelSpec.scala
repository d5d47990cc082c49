package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming funnel: in-order replay of the real corpus in adversarial
  * micro-batch slices must reproduce the batch q25_funnel counts AND a
  * plain-Scala per-user recompute of the chained stage times. */
class StreamingFunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("replayed funnel state equals batch stage counts and exact times") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val events = graft.Tables.events(spark, dir)
      .selectExpr("user_id", "event_type", "ts div 1000 AS us")
      .as[(Long, String, Long)].collect().toSeq
      .map { case (u, t, us) => FunnelEvent(u, t, us) }
      .sortBy(e => (e.us, e.typ)) // the in-order delivery contract

    val mem = MemoryStream[FunnelEvent]
    val name = s"fn${System.nanoTime()}"
    val q = StreamingFunnel.funnelStream(mem.toDS())
      .writeStream.outputMode("update").format("memory").queryName(name)
      .start()
    val states = try {
      val cuts = Seq(0, 1, 37, events.size / 3, events.size / 2, events.size)
      for (Seq(a, b) <- cuts.sliding(2)) {
        mem.addData(events.slice(a, b): _*)
        q.processAllAvailable()
      }
      spark.table(name).as[FunnelState].collect()
        .zipWithIndex
        .groupBy(_._1.userId)
        .map { case (u, rows) => u -> rows.maxBy(_._2)._1 }
    } finally q.stop()

    // exact per-user recompute: t1 = min view; t2 = min click > t1; ...
    val byUser = events.groupBy(_.userId)
    val ref = byUser.map { case (u, es) =>
      val t1 = es.filter(_.typ == "view").map(_.us).minOption
      val t2 = t1.flatMap(a =>
        es.filter(e => e.typ == "click" && e.us > a).map(_.us).minOption)
      val t3 = t2.flatMap(a =>
        es.filter(e => e.typ == "purchase" && e.us > a).map(_.us).minOption)
      u -> FunnelState(u, t1, t2, t3)
    }
    assert(states.keySet == ref.keySet)
    for ((u, st) <- states) assert(st == ref(u), s"user $u")

    // and the stage counts equal the batch q25_funnel users column
    val batch = graft.SparkEntry.queries("q25_funnel")(spark, dir)
      .select("stage", "users").as[(String, Long)].collect().toMap
    assert(batch("1_view") == states.values.count(_.stage >= 1))
    assert(batch("2_click") == states.values.count(_.stage >= 2))
    assert(batch("3_purchase") == states.values.count(_.stage >= 3))
  }

  test("strictly-after semantics: same-instant events never advance") {
    assert(StreamingFunnel.advance(
      FunnelState(1, Some(10), None, None), FunnelEvent(1, "click", 10))
      == FunnelState(1, Some(10), None, None))
    assert(StreamingFunnel.advance(
      FunnelState(1, Some(10), None, None), FunnelEvent(1, "click", 11))
      == FunnelState(1, Some(10), Some(11), None))
    // a purchase cannot skip the click stage
    assert(StreamingFunnel.advance(
      FunnelState(1, Some(10), None, None), FunnelEvent(1, "purchase", 20))
      == FunnelState(1, Some(10), None, None))
  }
}
