package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The live retention tracker replayed over the real corpus (event-time
  * order, adversarial micro-batch cuts) must emit increments that sum
  * to exactly the batch `cohort_retention` matrix — two longs of state
  * per user, no seen-week set. */
class StreamingRetentionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("summed increments equal the batch retention matrix exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val events = graft.Tables.events(spark, dir)
      .selectExpr("user_id", "ts").collect()
      .map(r => RetainEvent(r.getLong(0), r.getLong(1))).toSeq
      .sortBy(_.tsNs)

    val mem = MemoryStream[RetainEvent]
    val name = s"rt${System.nanoTime()}"
    val q = StreamingRetention.retentionStream(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    val got = try {
      val cuts = Seq(0, 1, 23, 500, events.size / 2, events.size)
      for (Seq(a, b) <- cuts.sliding(2)) {
        mem.addData(events.slice(a, b): _*)
        q.processAllAvailable()
      }
      spark.table(name).as[(Long, Long)].collect().toSeq
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    } finally q.stop()

    val batch = graft.SparkEntry.queries("cohort_retention")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(batch.nonEmpty)
    assert(got == batch)
    // cohort sizes are the offset-0 diagonal on both sides
    val sizes = graft.SparkEntry.queries("cohort_retention")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    sizes.foreach { case (cw, n) =>
      assert(got((cw, 0L)) == n, s"cohort $cw size")
    }
  }

  test("transformWithState form emits the identical increment multiset") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val events = graft.Tables.events(spark, dir)
      .selectExpr("user_id", "ts").collect()
      .map(r => RetainEvent(r.getLong(0), r.getLong(1))).toSeq
      .sortBy(_.tsNs)
    // the new API requires the RocksDB state store
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[RetainEvent]
      val name = s"rtx${System.nanoTime()}"
      val q = RetentionProcessor.retentionStream(mem.toDS())
        .writeStream.outputMode("append").format("memory").queryName(name)
        .start()
      val got = try {
        val cuts = Seq(0, 1, 23, 500, events.size / 2, events.size)
        for (Seq(a, b) <- cuts.sliding(2)) {
          mem.addData(events.slice(a, b): _*)
          q.processAllAvailable()
        }
        spark.table(name).as[(Long, Long)].collect().toSeq
          .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      } finally q.stop()
      val batch = graft.SparkEntry.queries("cohort_retention")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == batch)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
