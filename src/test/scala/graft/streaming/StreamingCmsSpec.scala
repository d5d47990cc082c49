package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The count-min sketch's additive-state claim, executed: replaying the
  * real corpus token stream in adversarial micro-batch slices must leave
  * EXACTLY the batch sketch in the streaming aggregation state — counts
  * are sums, sums merge by addition, so stream/batch parity is bit-exact
  * with no tolerance. Plus the CMS guarantees on the batch query itself:
  * estimates never underestimate, and each sketch row conserves the
  * full occurrence mass. */
class StreamingCmsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val p = graft.functions.PolyHash.P

  // the corpus token stream as the batch query folds it
  private lazy val toks: Seq[CmsTok] =
    graft.Tables.documents(spark, dir)
      .select("text").collect().map(_.getString(0)).toSeq
      .flatMap(_.split(" ", -1).map(t =>
        CmsTok(graft.functions.PolyHash.hashBytes(t.getBytes("UTF-8")))))

  private def cell(h: Long, m: Long): Long =
    h % p * m % p % graft.Pipeline.CmsW

  test("replayed sketch state equals the batch sketch and its estimates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // reference sketch: the plain-Scala fold of the same stream
    val expected = toks
      .flatMap(t => graft.Pipeline.CmsMul.zipWithIndex.map { case (m, i) =>
        (i.toLong, cell(t.h, m)) })
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }

    val mem = MemoryStream[CmsTok]
    val name = s"cms${System.nanoTime()}"
    val q = StreamingCms.cmsStream(mem.toDS(), graft.Pipeline.CmsD,
        graft.Pipeline.CmsW, graft.Pipeline.CmsMul, p)
      .writeStream.outputMode("update").format("memory").queryName(name)
      .start()
    val live = try {
      val cuts = Seq(0, 1, 7, 100, toks.size / 2, toks.size)
      for (Seq(a, b) <- cuts.sliding(2)) {
        mem.addData(toks.slice(a, b): _*)
        q.processAllAvailable()
      }
      // update mode: last emitted row per cell is the live counter
      spark.table(name).as[(Long, Long, Long)].collect().zipWithIndex
        .groupBy(r => (r._1._1, r._1._2))
        .map { case (k, rows) => k -> rows.maxBy(_._2)._1._3 }
    } finally q.stop()

    assert(live == expected)

    // the read-out arithmetic agrees with the batch query's panel
    val batch = graft.SparkEntry.queries("cms_heavy_hitters")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(batch.nonEmpty)
    batch.foreach { case (tok, n, est) =>
      val h = graft.functions.PolyHash.hashBytes(tok.getBytes("UTF-8"))
      assert(StreamingCms.estimate(live, h, graft.Pipeline.CmsMul, p,
        graft.Pipeline.CmsW) == est)
      assert(est >= n, s"CMS must never underestimate ($tok)")
    }
  }

  test("the SQL cell arithmetic matches the Scala fold; mass conserves") {
    import spark.implicits._
    // build the sketch through the ENGINE's expression path (the same
    // named_struct/modular SQL the batch query and streaming twin use)
    // and compare cell-for-cell against the plain-Scala fold above
    val cells = graft.Pipeline.CmsMul.zipWithIndex.map { case (m, i) =>
      s"named_struct('r', ${i}L, 'b', h % ${p}L * ${m}L % ${p}L % " +
        s"${graft.Pipeline.CmsW})" }
    val viaSql = toks.toDS()
      .selectExpr(s"explode(array(${cells.mkString(", ")})) AS cell")
      .groupBy($"cell.r", $"cell.b").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val viaScala = toks
      .flatMap(t => graft.Pipeline.CmsMul.zipWithIndex.map { case (m, i) =>
        (i.toLong, cell(t.h, m)) })
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(viaSql == viaScala)
    // every row holds the full occurrence mass — the additive invariant
    // that makes the sketch mergeable across shards and micro-batches
    val mass = viaSql.groupBy(_._1._1).map { case (_, m) => m.values.sum }
    assert(mass.toSet == Set(toks.size.toLong))
  }
}
