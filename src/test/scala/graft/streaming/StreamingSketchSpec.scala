package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming KMV state replayed over the real corpus in adversarial
  * micro-batch slices must reproduce the reference K-smallest-distinct
  * sets AND the batch `kmv_distinct` estimates — the bounded-mergeable-
  * state claim of functions/KMinValues, executed as a stream. */
class StreamingSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("replayed sketch state equals reference sets and batch estimates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val k = graft.Pipeline.KmvK
    val p = graft.functions.PolyHash.P
    // the batch query's scrambled token hashes, computed once driver-side
    val toks = graft.Tables.documents(spark, dir)
      .select("source", "text").as[(String, String)].collect().toSeq
      .sortBy(_._1)
      .flatMap { case (src, text) =>
        text.split(" ", -1).map(t => SketchTok(src,
          graft.functions.PolyHash.hashBytes(t.getBytes("UTF-8"))
            * 2654435761L % p))
      }

    val mem = MemoryStream[SketchTok]
    val name = s"kv${System.nanoTime()}"
    val q = StreamingSketch.kmvStream(mem.toDS(), k)
      .writeStream.outputMode("update").format("memory").queryName(name)
      .start()
    val sketches = try {
      val cuts = Seq(0, 1, 13, 100, toks.size / 2, toks.size)
      for (Seq(a, b) <- cuts.sliding(2)) {
        mem.addData(toks.slice(a, b): _*)
        q.processAllAvailable()
      }
      // update mode: the LAST emitted row per source is the live sketch
      spark.table(name).as[(String, Seq[Long])].collect()
        .zipWithIndex
        .groupBy(_._1._1)
        .map { case (s, rows) => s -> rows.maxBy(_._2)._1._2 }
    } finally q.stop()

    // reference: K smallest distinct per source
    val ref = toks.groupBy(_.source)
      .map { case (s, ts) => s -> ts.map(_.h).distinct.sorted.take(k) }
    assert(sketches.keySet == ref.keySet)
    for ((s, ks) <- sketches) assert(ks == ref(s), s"source $s")

    // and the estimates match the batch kmv_distinct column exactly
    val batch = graft.SparkEntry.queries("kmv_distinct")(spark, dir)
      .select("source", "kmv_estimate").as[(String, Double)].collect().toMap
    for ((s, ks) <- sketches)
      assert(StreamingSketch.estimate(ks, k, p) == batch(s), s"estimate $s")
  }
}
