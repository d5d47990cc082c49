package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The stream-stream interval join replayed over the real corpus's two
  * event streams must emit exactly the batch candidate pair set, and
  * its min/max fold per purchase must reproduce the q32 attribution
  * rows for every purchase with an in-window view. */
class StreamingAttributionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("emitted pairs equal the batch interval set; fold matches q32") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, dir)
      .selectExpr("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._3)
    val views = ev.filter(_._4 == "view")
      .map(r => ViewEvent(r._1, r._2, r._3)).toSeq
    val purchases = ev.filter(_._4 == "purchase")
      .map(r => PurchaseEvent(r._1, r._2, r._3)).toSeq

    val vm = MemoryStream[ViewEvent]
    val pm = MemoryStream[PurchaseEvent]
    val name = s"att${System.nanoTime()}"
    val q = StreamingAttribution
      .attributionStream(vm.toDS(), pm.toDS())
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    val got = try {
      // interleave the two streams in event-time slices
      val cuts = Seq(0, 1, 9, 200, views.size / 2, views.size)
      for (Seq(a, b) <- cuts.sliding(2)) {
        vm.addData(views.slice(a, b): _*)
        pm.addData(purchases.filter(p =>
          (a until b).exists(i => i < views.size &&
            views(i).tsNs <= p.tsNs) || b >= views.size): _*)
        q.processAllAvailable()
      }
      // everything is in; one more round to drain
      q.processAllAvailable()
      spark.table(name).selectExpr("purchaseId", "viewId").as[(Long, Long)]
        .collect().toSet
    } finally q.stop()

    // batch truth: all same-user pairs with the view in the window, on
    // the operator's µs axis
    def us(ns: Long) = ns / 1000
    val expected = (for {
      p <- purchases
      v <- views
      if v.userId == p.userId && us(v.tsNs) <= us(p.tsNs) &&
        us(v.tsNs) >= us(p.tsNs) - StreamingAttribution.WindowNs / 1000
    } yield (p.purchaseId, v.viewId)).toSet
    assert(got == expected)
    assert(got.nonEmpty)

    // fold to first/last per purchase and line up with q32 (which uses
    // an UNBOUNDED preceding window, so compare only purchases whose
    // q32 last_touch falls inside the 10-minute window)
    val folded = got.groupBy(_._1).map { case (pid, vs) =>
      pid -> (vs.map(_._2).min, vs.map(_._2).max)
    }
    val viewTs = views.map(v => v.viewId -> v.tsNs).toMap
    val q32 = graft.SparkEntry.queries("q32_attribution")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    var checked = 0
    q32.foreach { case (pid, _, lastTouch) =>
      if (lastTouch >= 0 && folded.contains(pid)) {
        val inWindowLast = got.filter(_._1 == pid).map(_._2)
          .maxBy(viewTs)
        // q32's last preceding view, when it sits inside the window,
        // must be the newest emitted pair
        val pNs = purchases.find(_.purchaseId == pid).get.tsNs
        if (viewTs(lastTouch) >= pNs - StreamingAttribution.WindowNs) {
          assert(inWindowLast == lastTouch, s"purchase $pid")
          checked += 1
        }
      }
    }
    assert(checked > 0, "no purchase exercised the q32 cross-check")
  }

  test("left outer: view-less purchases emit exactly once after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, dir)
      .selectExpr("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._3)
    val views = ev.filter(_._4 == "view")
      .map(r => ViewEvent(r._1, r._2, r._3)).toSeq
    val purchases = ev.filter(_._4 == "purchase")
      .map(r => PurchaseEvent(r._1, r._2, r._3)).toSeq

    val vm = MemoryStream[ViewEvent]
    val pm = MemoryStream[PurchaseEvent]
    val name = s"atl${System.nanoTime()}"
    val q = StreamingAttribution
      .attributionStreamOuter(vm.toDS(), pm.toDS())
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    val rows = try {
      vm.addData(views: _*)
      pm.addData(purchases: _*)
      q.processAllAvailable()
      // advance BOTH watermarks far past the data so every held-back
      // unmatched purchase seals and emits its null-view row
      val far = ev.last._3 + 3600L * 1000000000L
      vm.addData(ViewEvent(-1L, -1L, far))
      pm.addData(PurchaseEvent(-1L, -2L, far))
      q.processAllAvailable()
      q.processAllAvailable()
      spark.table(name)
        .selectExpr("purchaseId", "viewId").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None
          else Some(r.getLong(1))))
        .filter(_._1 >= 0) // drop the sentinel's own row
    } finally q.stop()

    def us(ns: Long) = ns / 1000
    val matched = purchases.filter(p => views.exists(v =>
      v.userId == p.userId && us(v.tsNs) <= us(p.tsNs) &&
        us(v.tsNs) >= us(p.tsNs) -
          StreamingAttribution.WindowNs / 1000)).map(_.purchaseId).toSet
    val unmatchedEmits = rows.filter(_._2.isEmpty).map(_._1)
    // every view-less purchase emits exactly once with a null view
    assert(unmatchedEmits.sorted.toSeq ==
      purchases.map(_.purchaseId).filterNot(matched).sorted)
    assert(unmatchedEmits.nonEmpty)
    // and no matched purchase ever emits a null-view row
    assert(!unmatchedEmits.exists(matched))
  }
}
