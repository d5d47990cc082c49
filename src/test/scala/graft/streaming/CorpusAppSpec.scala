package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The composed streaming corpus-ingest application (gate → chunk →
  * pack as one standing query) replayed over the real corpus must
  * reproduce the batch `prepare_corpus` rows exactly — the corpus-side
  * counterpart of DetectorAppSpec's detector parity. */
class CorpusAppSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val B = 1000L * 1000000000L

  test("composed stream == batch prepare_corpus on the real corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, dir)
      .selectExpr("doc_id", "source", "lang", "text")
      .as[(Long, String, String, String)].collect().toSeq.sortBy(_._1)
      .map { case (id, src, lang, t) => IngestDoc(id, B + id, src, lang, t) }

    val mem = MemoryStream[IngestDoc]
    val name = s"ca${System.nanoTime()}"
    val q = CorpusApp.composedStream(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    val got = try {
      // uneven micro-batches incl. singleton and big-tail slices: the
      // gate keeper, the chunk fan-out, and the per-shard offsets all
      // have to carry across trigger boundaries
      val cuts = Seq(0, 3, 4, 17, docs.size / 3, docs.size)
      for (Seq(a, b) <- cuts.sliding(2)) {
        mem.addData(docs.slice(a, b): _*)
        q.processAllAvailable()
      }
      spark.table(name).as[PackedChunk].collect().toSeq
        .sortBy(c => (c.source, c.docId, c.chunkId))
    } finally q.stop()

    val want = graft.SparkEntry.queries("prepare_corpus")(spark, dir)
      .selectExpr("source", "doc_id", "chunk_id", "n_tok", "start_off",
        "seq_id", "spans_boundary")
      .as[(String, Long, Int, Int, Long, Long, Boolean)].collect().toSeq
      .map { case (s, d, c, n, o, q2, sp) =>
        PackedChunk(s, d, c, n.toLong, o, q2, sp)
      }
      .sortBy(c => (c.source, c.docId, c.chunkId))

    assert(got.nonEmpty, "composed stream emitted nothing")
    assert(got == want,
      s"stream/batch divergence: ${got.size} vs ${want.size} rows")
  }

  test("the standing file-source application runs end to end") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("corpusapp").toString
    val in = s"$tmp/in"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    graft.Tables.documents(spark, dir)
      .selectExpr("doc_id AS docId", s"doc_id + ${B}L AS tsNs", "source",
        "lang", "text")
      .coalesce(1).write.json(in)
    val q = CorpusApp.run(spark, in, out, ckpt,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination(120000)
    val rows = spark.read.parquet(s"$out/packed")
    val want = graft.SparkEntry.queries("prepare_corpus")(spark, dir).count()
    assert(rows.count() == want, "file-source app row count != batch")
  }
}
