package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions installs poly_hash and dot_p for plain SQL") {
    // getOrCreate ignores withExtensions when a session already exists in
    // this JVM (shared by other suites) — stop it so the builder applies.
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val h = spark.sql("SELECT poly_hash('ab') AS h").collect().head.getLong(0)
      assert(h == ((0L * 31 + 'a') * 31 + 'b') % graft.functions.PolyHash.P)
      val d = spark.sql(
        "SELECT dot_p(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect().head.getDouble(0)
      assert(d == 11.0)
      // simhash_sig: single element 5L = 0b101 → all its bits win the vote
      val sh = spark.sql("SELECT simhash_sig(array(5L), 16) AS s")
        .collect().head.getLong(0)
      assert(sh == 5L)
    } finally spark.stop()
  }
}
