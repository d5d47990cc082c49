package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Perf probe (not a correctness pin): bounds the bzip2 encoder's
  * cost at gate shard sizes so a rotation-sort regression surfaces
  * here before it lands in the bench. Thresholds are deliberately
  * loose (CI-host tolerant). */
class Bzip2PerfProbe extends AnyFunSuite {
  test("encode throughput at shard sizes") {
    val rnd = new scala.util.Random(1)
    for (n <- Seq(30000, 100000, 300000)) {
      val text = Array.fill[Byte](n)(('a' + rnd.nextInt(20)).toByte)
      val t0 = System.nanoTime()
      val enc = Bzip2.encode(text)
      val t1 = System.nanoTime()
      assert(Bzip2.decode(enc).get.sameElements(text))
      val t2 = System.nanoTime()
      info(f"n=$n%7d encode=${(t1 - t0) / 1e6}%8.1f ms " +
        f"decode=${(t2 - t1) / 1e6}%8.1f ms " +
        f"ratio=${enc.length.toDouble / n}%.3f")
    }
  }
}
