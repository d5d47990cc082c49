package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form pins for the training-objective example builders:
  * T5-style span corruption (sentinel numbering, schedule, short tail
  * spans) and the FIM thirds transform (PSM/SPM orders, degenerate
  * one-token docs). */
class ObjectivePrepSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixtureDir(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_obj").toString
    docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("span_corrupt: schedule, sentinel numbering, short tail span") {
    val w18 = (0 until 18).map(i => s"t$i")
    val dir = fixtureDir(Seq(
      0L -> "a b c d e f g",        // groups: [abc]* [def] [g]
      1L -> w18.mkString(" ")))     // groups 0..5 → masks g0, g5
    val r = Pipeline.queries("span_corrupt")(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    val d0 = r(0L)
    assert(d0.getLong(1) == 7L && d0.getLong(2) == 3L && d0.getLong(3) == 1L)
    assert(d0.getString(4) == md5hex("<extra_id_0> d e f g"))
    assert(d0.getString(5) == md5hex("<extra_id_0> a b c"))
    val d1 = r(1L)
    assert(d1.getLong(2) == 6L && d1.getLong(3) == 2L)
    val mid = (3 until 15).map(i => s"t$i").mkString(" ")
    assert(d1.getString(4) == md5hex(s"<extra_id_0> $mid <extra_id_1>"))
    assert(d1.getString(5) ==
      md5hex("<extra_id_0> t0 t1 t2 <extra_id_1> t15 t16 t17"))
  }

  test("fim_transform: thirds split, PSM and SPM orders, 1-token doc") {
    val dir = fixtureDir(Seq(0L -> "a b c d e f g", 1L -> "x"))
    val r = Pipeline.queries("fim_transform")(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    val d0 = r(0L) // n=7: prefix [a,b], middle [c,d], suffix [e,f,g]
    assert(d0.getLong(1) == 7L && d0.getLong(2) == 2L && d0.getLong(3) == 2L)
    assert(d0.getString(4) ==
      md5hex("<fim_pre> a b <fim_suf> e f g <fim_mid> c d"))
    assert(d0.getString(5) ==
      md5hex("<fim_suf> e f g <fim_pre> a b <fim_mid> c d"))
    val d1 = r(1L) // n=1: everything lands in the suffix
    assert(d1.getLong(2) == 0L && d1.getLong(3) == 0L)
    assert(d1.getString(4) == md5hex("<fim_pre>  <fim_suf> x <fim_mid> "))
  }

  test("mask rate sits at the designed 20% on the driver corpus") {
    val agg = Pipeline.queries("span_corrupt")(
      spark, "/root/testdata/sf0.001")
      .selectExpr("sum(n_masked) AS m", "sum(n_tokens) AS t").collect()(0)
    val rate = agg.getLong(0).toDouble / agg.getLong(1)
    assert(rate > 0.15 && rate < 0.25, s"mask rate $rate")
  }
}
