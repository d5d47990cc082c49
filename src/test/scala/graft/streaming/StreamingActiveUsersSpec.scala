package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The live DAU/WAU chain replayed over the real corpus in adversarial
  * micro-batch slices must seal exactly the batch `active_users` rows —
  * the dedup → windowed-count composition, executed end to end with
  * real event times. */
class StreamingActiveUsersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sealed day windows equal the batch DAU/WAU on real events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val events = graft.Tables.events(spark, dir)
      .selectExpr("user_id", "ts").collect()
      .map(r => ActivityEvent(r.getLong(0), r.getLong(1))).toSeq
      .sortBy(_.tsNs)

    val mem = MemoryStream[ActivityEvent]
    val name = s"au${System.nanoTime()}"
    val q = StreamingActiveUsers.activeStream(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    val got = try {
      val cuts = Seq(0, 1, 17, 400, events.size / 2, events.size)
      for (Seq(a, b) <- cuts.sliding(2)) {
        mem.addData(events.slice(a, b): _*)
        q.processAllAvailable()
      }
      // sentinel far past the data seals every real day window
      val lastNs = events.last.tsNs
      mem.addData(ActivityEvent(-1L,
        lastNs + 40L * StreamingActiveUsers.NsPerDay))
      q.processAllAvailable()
      spark.table(name).as[(Long, String, Long)].collect()
        .groupBy(r => (r._1, r._2))
        .map { case (k, rows) => k -> rows.map(_._3).sum }
    } finally q.stop()

    // batch truth: the active_users query on the same table (its days
    // are exactly the sealed dau days; wau covers extend past the data
    // but only days with a dau row are compared — the query's own
    // inner-join contract)
    val batch = graft.SparkEntry.queries("active_users")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(batch.nonEmpty)
    batch.foreach { case (day, dau, wau) =>
      assert(got.getOrElse((day, "dau"), 0L) == dau, s"dau day $day")
      assert(got.getOrElse((day, "wau"), 0L) == wau, s"wau day $day")
    }
    // the sentinel's own cover rows are the only extra dau day
    val extraDau = got.keys.filter(_._2 == "dau").map(_._1)
      .filterNot(batch.map(_._1).toSet)
    assert(extraDau.size <= 1)
  }
}
