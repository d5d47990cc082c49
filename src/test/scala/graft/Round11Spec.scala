package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the round-11 scale tools, on the REAL corpus:
  * rendezvous sharding's load uniformity and minimal-disruption
  * contract (the COVERAGE claims, asserted rather than prose), and
  * the Bloom panel's sketch laws (no false negatives anywhere, the
  * undersized filter strictly noisier than the right-sized one). */
class Round11Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  test("rendezvous: near-uniform loads, moves only onto the new shard") {
    import spark.implicits._
    val rows = SparkEntry.queries("shard_rendezvous")(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect()
    val total = rows.map(_._3).sum
    // every moved row lands on the ADDED shard (index 8) — the HRW
    // minimal-disruption law, not a statistical property
    for ((s8, s9, _, moved) <- rows) {
      assert(moved == (s8 != s9))
      if (moved) assert(s9 == 8L, s"moved row $s8 -> $s9")
    }
    // moved mass ~ 1/9 of the corpus (generous band: 5%..18%)
    val movedN = rows.filter(_._4).map(_._3).sum
    assert(movedN * 100 >= total * 5 && movedN * 100 <= total * 18,
      s"moved $movedN of $total")
    // 8-shard loads within 3x of each other (the broken linear score
    // measured 22 vs 93 at 500 docs; the quadratic mix stays tight)
    val loads = rows.groupBy(_._1).map(_._2.map(_._3).sum).toSeq
    assert(loads.size == 8)
    assert(loads.max <= 3 * loads.min, s"skewed loads $loads")
  }

  test("bloom panel: zero false negatives, undersized strictly noisier") {
    import spark.implicits._
    val rows = SparkEntry.queries("bloom_dedup")(spark, dir)
      .select("m_bits", "true_dup", "bloom_pos", "false_pos", "false_neg")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((m, dup, pos, fp, fn) <- rows) {
      assert(fn == 0L, s"false negative at m=$m")
      assert(pos == dup + fp, s"hit accounting at m=$m")
    }
    val fpSmall = rows.filter(_._1 == 1024L).map(_._4).sum
    val fpBig = rows.filter(_._1 == 65536L).map(_._4).sum
    // at sf0.01 load the 1024-bit filter measured ~50% FP and the
    // 8 KiB one 0 — require an order of magnitude between them, not
    // the exact corpus-specific counts (testdata regenerates)
    assert(fpSmall >= 10 * math.max(fpBig, 1L),
      s"undersized filter ($fpSmall FPs) must dwarf 8 KiB ($fpBig)")
  }
}
