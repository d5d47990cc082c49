package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Perf probe (not a correctness pin): measures the from-scratch
  * zstd ENCODER's ratio and throughput against zstd-jni level 3 on
  * corpus-shaped text, so a matcher or entropy-coder regression
  * surfaces here before it lands in the jsonl_zst_write bench.
  * Thresholds are deliberately loose (CI-host tolerant): the
  * greedy LZ77 + predefined-FSE + single-table-Huffman design is
  * documented to trail libzstd's optimal parser — what's pinned is
  * that it stays in the same order of magnitude, not parity. */
class ZstdPerfProbe extends AnyFunSuite {
  test("encode ratio + throughput vs zstd-jni on jsonl-like text") {
    val rnd = new scala.util.Random(42)
    val langs = Seq("en", "de", "fr", "es", "pt")
    val words = Seq("model", "data", "token", "stream", "shard",
      "batch", "index", "query", "value", "field")
    def doc(i: Int): String = {
      val body = (0 until 40).map(_ =>
        words(rnd.nextInt(words.length))).mkString(" ")
      s"""{"doc_id":$i,"lang":"${langs(i % 5)}","text":"$body"}"""
    }
    for (n <- Seq(1000, 10000)) {
      val data = (0 until n).map(doc).mkString("\n").getBytes("UTF-8")
      val t0 = System.nanoTime()
      val ours = ZstdEncode.encode(data)
      val t1 = System.nanoTime()
      val jni = com.github.luben.zstd.Zstd.compress(data, 3)
      val t2 = System.nanoTime()
      assert(Zstd.decode(ours).exists(_.sameElements(data)))
      val ourRatio = ours.length.toDouble / data.length
      val jniRatio = jni.length.toDouble / data.length
      val ourMBs = data.length / 1e6 / ((t1 - t0) / 1e9)
      info(f"n=$n%6d in=${data.length}%8d ours=${ours.length}%8d " +
        f"(${ourRatio}%.3f, $ourMBs%6.1f MB/s) " +
        f"jni-3=${jni.length}%8d (${jniRatio}%.3f, " +
        f"${data.length / 1e6 / ((t2 - t1) / 1e9)}%6.1f MB/s)")
      // same order of magnitude as the reference encoder, and far
      // from store mode
      assert(ours.length < data.length / 2,
        s"barely compressing: ${ours.length}/${data.length}")
      assert(ours.length.toDouble <= jni.length.toDouble * 3.0,
        s"ratio fell >3x behind jni-3: $ourRatio vs $jniRatio")
    }
  }
}
