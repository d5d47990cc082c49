package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent recomputes and assumption checks for the analytics
  * module: the oracle gate proves SQL parity; these prove the STATISTICS
  * are the ones claimed (plain-Scala z/MAD recompute) and that the ER
  * blocking key loses nothing on this vocabulary. */
class AnalyticsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("value_outliers matches a plain-Scala z/MAD recompute") {
    val ev = Tables.events(spark, dir)
      .selectExpr("event_id", "event_type",
        "CAST(round(value * 100) AS BIGINT) AS vc")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((s.length - 1) / 2) + s(s.length / 2)  // lower + upper middle
    }
    val expected = ev.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val vs = rows.map(_._3).toSeq
      val n = vs.length.toLong
      val sv = vs.sum
      val svv = vs.map(v => v * v).sum
      val m2 = med2(vs)
      val mad4 = med2(vs.map(v => math.abs(2 * v - m2)))
      rows.flatMap { case (id, t, v) =>
        val zf = { val d = n * v - sv; d * d > 9 * (n * svv - sv * sv) }
        val mf = 2 * math.abs(2 * v - m2) > 3 * mad4
        if (zf || mf) Some((id, t, v, zf, mf)) else None
      }
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("value_outliers")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.exists(_._4) && got.exists(_._5),
      "both tests must flag something — vacuous otherwise")
    // the robust test must visibly disagree with the z-test on this
    // long-tailed data (that disagreement is why both ship)
    assert(got.count(_._5) > got.count(_._4))
  }

  test("event_transitions is row-stochastic up to ppm truncation") {
    val rows = SparkEntry.queries("event_transitions")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (from, ts) =>
      val total = ts.map(_._3).sum
      // each truncating div drops < 1 ppm; k cells lose < k ppm total
      assert(total <= 1000000L && total > 1000000L - ts.length,
        s"row $from sums to $total ppm")
    }
    // transitions must cover the full type×type space on this corpus
    assert(rows.length == 25)
  }

  test("fuzzy_join blocking is lossless on this name vocabulary") {
    val names = Tables.part(spark, dir).select("p_name").distinct()
      .collect().map(_.getString(0)).toSeq
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val full = (for {
      a <- names; b <- names if a < b
      d = lev(a, b) if d <= Analytics.FuzzyMaxDistance
    } yield (a, b, d.toLong)).sorted
    val blocked = SparkEntry.queries("fuzzy_join")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq.sorted
    // every unblocked match survives blocking: cross-block pairs (names
    // with different nouns) are all ≥ 3 edits apart on this vocabulary,
    // so the noun key is a safe partition — this is the assumption the
    // production blocking strategy rests on, stated as a test
    assert(blocked == full)
    assert(blocked.nonEmpty)
  }
}
