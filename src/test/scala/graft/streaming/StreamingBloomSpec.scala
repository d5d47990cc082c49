package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming Bloom state replayed over the real corpus in adversarial
  * micro-batch slices must reproduce the batch-built bitsets BIT FOR
  * BIT (merge = OR is slice-invariant), and probing the incoming
  * batch against the streamed filters must reproduce the batch
  * `bloom_dedup` panel counts exactly. */
class StreamingBloomSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("replayed bitsets equal the batch build; probes equal the panel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val p = graft.functions.PolyHash.P
    val ms = graft.Pipeline.BloomMs
    val muls = graft.Pipeline.CmsMul
    // the batch query's content fingerprints, computed once driver-side
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
      .map { case (id, src, text) =>
        (id, src, graft.functions.PolyHash.hashBytes(
          text.getBytes("UTF-8")) * 2654435761L % p)
      }
    val corpus = docs.filter(_._1 % 10 < 8)
    val incoming = docs.filter(_._1 % 10 >= 6)

    val mem = MemoryStream[BloomKey]
    val name = s"bl${System.nanoTime()}"
    val q = StreamingBloom.bitsStream(mem.toDS(), ms, muls, p)
      .writeStream.outputMode("update").format("memory").queryName(name)
      .start()
    val bits = try {
      val keys = corpus.map(c => BloomKey("corpus", c._3))
      val cuts = Seq(0, 1, 7, keys.size / 3, keys.size / 2, keys.size)
      for (Seq(a, b) <- cuts.sliding(2)) {
        mem.addData(keys.slice(a, b): _*)
        q.processAllAvailable()
      }
      // update mode: the LAST emitted row is the live filter pair
      spark.table(name)
        .select("bits_" + ms.head, "bits_" + ms(1))
        .as[(Seq[Long], Seq[Long])].collect().last
    } finally q.stop()

    // bit-identical to the direct batch aggregation
    val batchBits = ms.map { m =>
      val agg = new graft.functions.BloomBits(m, muls, p)
      corpus.map(_._3).foldLeft(agg.zero)(agg.reduce).bits
    }
    assert(bits._1 == batchBits.head, "1024-bit filter differs")
    assert(bits._2 == batchBits(1), "65536-bit filter differs")

    // probing incoming against the STREAMED filters reproduces the
    // batch bloom_dedup panel counts per (m_bits, source)
    val panel = graft.SparkEntry.queries("bloom_dedup")(spark, dir)
      .select("source", "m_bits", "bloom_pos")
      .as[(String, Long, Long)].collect()
      .map { case (s, m, c) => (s, m) -> c }.toMap
    for ((m, bs) <- ms.zip(Seq(bits._1, bits._2))) {
      val got = incoming.groupBy(_._2).map { case (src, rows) =>
        (src, m.toLong) ->
          rows.count(r => StreamingBloom.isHit(bs, r._3, m, muls, p)).toLong
      }
      for ((k, v) <- got)
        assert(panel(k) == v, s"panel mismatch at $k")
      assert(got.keySet == panel.keySet.filter(_._2 == m.toLong))
    }
  }
}
