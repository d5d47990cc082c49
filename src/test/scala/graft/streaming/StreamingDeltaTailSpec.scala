package graft.streaming

import graft.operators.DeltaLog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Delta log-tail parity: a LIVE streaming query over the table's
  * `_delta_log` sees commits that land while it runs, emits each
  * commit's added rows in version order, and its cumulative output
  * equals the batch snapshot read of the same table — including
  * injected typed partition columns. A remove commit fails the
  * query loudly (the append-only contract). */
class StreamingDeltaTailSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpTable(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$tag")
      .toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/tbl"
  }

  private def seed(from: Int, until: Int) = {
    val s = spark
    import s.implicits._
    (from until until).map(i => (i.toLong, s"row$i", i % 3))
      .toDF("id", "txt", "bucket")
  }

  private def appendCommit(t: String, version: Long, from: Int,
      until: Int): Unit = {
    val dir = s"$t/app$version"
    // hive-style like the table: partition values come from the log
    seed(from, until).write.partitionBy("bucket").parquet(dir)
    val adds = DeltaLog.listDataFiles(spark, t, Seq("bucket"))
      .filter(_.path.startsWith(s"app$version/"))
    DeltaLog.commit(spark, t, version, adds.map(DeltaLog.addJson))
  }

  test("cumulative tail == batch snapshot, commits landing live") {
    val s = spark
    import s.implicits._
    val t = tmpTable("dtail")
    DeltaLog.create(spark, seed(0, 20), t, partitionBy = Seq("bucket"))

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Seq[(Long, String, Int)])]()
    val q = StreamingDeltaTail.start(spark, t, (v, df) =>
      seen.add((v, df.select($"id", $"txt", $"bucket")
        .as[(Long, String, Int)].collect().toSeq)): Unit)
    try {
      q.processAllAvailable()
      // v0 arrived as the first tailed commit
      assert(seen.size() == 1 && seen.peek()._1 == 0L)
      assert(seen.peek()._2.length == 20)
      // partition column injected with its real values
      assert(seen.peek()._2.map(_._3).toSet == Set(0, 1, 2))

      // two appends land WHILE the query runs
      appendCommit(t, 1L, 20, 25)
      q.processAllAvailable()
      appendCommit(t, 2L, 25, 32)
      q.processAllAvailable()

      val versions = seen.toArray(Array.empty[(Long,
        Seq[(Long, String, Int)])]).toSeq
      assert(versions.map(_._1) == Seq(0L, 1L, 2L))
      val streamed = versions.flatMap(_._2).sortBy(_._1)
      val batch = DeltaLog.read(spark, t)
        .select($"id", $"txt", $"bucket")
        .as[(Long, String, Int)].collect().toSeq.sortBy(_._1)
      assert(streamed == batch)
      assert(batch.length == 32)
    } finally q.stop()
  }

  test("a remove commit fails the tail loudly") {
    val t = tmpTable("dtail_rm")
    DeltaLog.create(spark, seed(0, 8), t)
    val snap = DeltaLog.snapshot(spark, t)
    val seen = new java.util.concurrent.atomic.AtomicInteger()
    val q = StreamingDeltaTail.start(spark, t,
      (_, df) => { seen.addAndGet(df.count().toInt); () })
    try {
      q.processAllAvailable()
      assert(seen.get() == 8)
      DeltaLog.commit(spark, t, 1L,
        snap.files.take(1).map(f => DeltaLog.removeJson(f.path, 1L)))
      val failed =
        try { q.processAllAvailable(); false }
        catch { case _: Exception => true }
      assert(failed || q.exception.isDefined)
    } finally q.stop()
  }
}
