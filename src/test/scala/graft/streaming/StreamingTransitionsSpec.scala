package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming transition chain: the emitted (from → to) pair multiset on
  * the real sf0.001 corpus — replayed in order but sliced adversarially
  * ACROSS micro-batches — must aggregate to exactly the batch
  * `event_transitions` matrix, including the pairs that bridge batch
  * boundaries. */
class StreamingTransitionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("stream pair counts equal the batch Markov matrix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.Tables.events(spark, dir)
      .selectExpr("user_id AS userId", "event_id AS eventId", "ts AS tsNs",
        "event_type AS eventType")
      .as[TransEvent].collect().toSeq
      .sortBy(e => (e.tsNs, e.eventId)) // global event-time replay order
    val mem = MemoryStream[TransEvent]
    val name = s"tr${System.nanoTime()}"
    val q = StreamingTransitions.transitionStream(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      // deliberately ragged slices so many user chains straddle batches
      val slices = Seq(7, 113, 1, 379, 2048, evs.length)
      var off = 0
      for (n <- slices if off < evs.length) {
        mem.addData(evs.slice(off, off + n): _*)
        q.processAllAvailable()
        off += n
      }
      if (off < evs.length) {
        mem.addData(evs.drop(off): _*)
        q.processAllAvailable()
      }
      val got = spark.table(name).as[Transition].collect()
        .groupBy(t => (t.fromType, t.toType))
        .view.mapValues(_.length.toLong).toMap
      val batch = graft.SparkEntry.queries("event_transitions")(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == batch)
      assert(got.values.sum == evs.length - evs.map(_.userId).distinct.size)
    } finally q.stop()
  }
}
