package graft

import graft.operators.Histograms
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class HistogramsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("save + save + rollup sums bins across snapshots (A8)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hist").toString
    val h1 = Seq((1L, 2L, 0L, 5L), (1L, 2L, 1L, 3L), (2L, 3L, 0L, 1L))
      .toDF("station_lo", "station_hi", "bin", "cnt")
    val h2 = Seq((1L, 2L, 0L, 2L), (2L, 3L, 5L, 7L))
      .toDF("station_lo", "station_hi", "bin", "cnt")
    Histograms.save(h1, dir)
    Histograms.save(h2, dir)
    val rolled = Histograms.rollup(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(rolled == Set((1L, 2L, 0L, 7L), (1L, 2L, 1L, 3L),
      (2L, 3L, 0L, 1L), (2L, 3L, 5L, 7L)))
    val meta = Histograms.rollupMeta(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(meta == Set((1L, 2L, 10L, 3L, 0L, 1L), (2L, 3L, 8L, 2L, 0L, 5L)))
  }
}
