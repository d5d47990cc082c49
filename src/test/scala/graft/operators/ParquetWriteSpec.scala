package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** From-scratch parquet WRITER pins: files built by [[ParquetWrite]]
  * (Thrift compact footer, PLAIN v1 pages, RLE def levels) must read
  * back value-exactly through THREE independent readers — Spark's
  * parquet-mr path, our own [[ParquetData]] page walker, and the
  * [[ParquetFooter]] audit — across all six kinds, nulls, and all
  * three codecs. */
class ParquetWriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkCols(n: Int): Seq[ParquetWrite.WCol] = Seq(
    ParquetWrite.WCol("id", "i64", optional = false,
      (0 until n).map(i => Some(i.toLong))),
    ParquetWrite.WCol("i", "i32", optional = true,
      (0 until n).map(i =>
        if (i % 7 == 3) None else Some(i - 500))),
    ParquetWrite.WCol("f", "f32", optional = true,
      (0 until n).map(i =>
        if (i % 5 == 2) None else Some(i / 3f))),
    ParquetWrite.WCol("d", "f64", optional = false,
      (0 until n).map(i => Some(i * 0.25 - 3.0))),
    ParquetWrite.WCol("flag", "boolean", optional = true,
      (0 until n).map(i =>
        if (i % 11 == 7) None else Some(i % 3 == 0))),
    ParquetWrite.WCol("s", "string", optional = true,
      (0 until n).map(i =>
        if (i % 13 == 9) None else Some(s"v${i % 23}-é$i"))),
    ParquetWrite.WCol("b", "binary", optional = false,
      (0 until n).map(i =>
        Some(Array.tabulate[Byte](i % 6)(j => (i + j).toByte)))))

  test("Spark's own reader reads our files value-exactly, " +
    "all codecs") {
    val n = 1500
    val cols = mkCols(n)
    for (codec <- Seq("uncompressed", "snappy", "gzip", "zstd")) {
      val bytes = ParquetWrite.build(cols, codec)
      val tmp = java.nio.file.Files.createTempDirectory("graft_pw")
      val fl = new java.io.File(tmp.toFile, "x.parquet")
      java.nio.file.Files.write(fl.toPath, bytes)
      val df = spark.read.parquet(fl.getAbsolutePath)
      assert(df.schema.fieldNames.toSeq ==
        Seq("id", "i", "f", "d", "flag", "s", "b"))
      assert(df.schema("s").dataType ==
        org.apache.spark.sql.types.StringType)
      assert(df.schema("id").dataType ==
        org.apache.spark.sql.types.LongType)
      val rows = df.collect().sortBy(_.getLong(0))
      assert(rows.length == n, codec)
      (0 until n by 13).foreach { i =>
        val r = rows(i)
        assert(r.getLong(0) == i.toLong)
        assert(Option(r.get(1)).map(_.asInstanceOf[Int]) ==
          cols(1).values(i))
        assert(Option(r.get(2)).map(_.asInstanceOf[Float]) ==
          cols(2).values(i))
        assert(r.getDouble(3) == i * 0.25 - 3.0)
        assert(Option(r.get(4)).map(_.asInstanceOf[Boolean]) ==
          cols(4).values(i), s"$codec flag at $i")
        assert(Option(r.get(5)).map(_.asInstanceOf[String]) ==
          cols(5).values(i))
        assert(r.get(6).asInstanceOf[Array[Byte]].toSeq ==
          cols(6).values(i).get.asInstanceOf[Array[Byte]].toSeq)
      }
      fl.delete(); tmp.toFile.delete()
    }
  }

  test("our OWN page walker and footer audit read our files") {
    val n = 800
    val cols = mkCols(n)
    for (codec <- Seq("snappy", "gzip", "zstd")) {
      val bytes = ParquetWrite.build(cols, codec)
      val foot = ParquetFooter.parse(bytes)
        .getOrElse(fail("our footer reader rejected our file"))
      assert(foot.numRows == n)
      assert(foot.rowGroups.length == 1)
      assert(foot.rowGroups.head.columns.map(_.path) ==
        Seq("id", "i", "f", "d", "flag", "s", "b"))
      val (leaves, vals) = ParquetData.decodeFile(bytes)
        .getOrElse(fail("our page walker rejected our file"))
      assert(leaves.map(_.name) ==
        Seq("id", "i", "f", "d", "flag", "s", "b"))
      (0 until n by 17).foreach { i =>
        assert(vals(0)(i).contains(i.toLong))
        assert(vals(1)(i).map {
          case l: Long => l.toInt
          case x: Int => x
        } == cols(1).values(i))
        assert(vals(4)(i) == cols(4).values(i), s"flag at $i")
        assert(vals(5)(i).map(v => new String(
          v.asInstanceOf[Array[Byte]], "UTF-8")) ==
          cols(5).values(i))
      }
    }
  }

  test("writer rejections: ragged lengths, nulls in required, " +
    "unknown kinds") {
    import ParquetWrite.WCol
    intercept[IllegalArgumentException](ParquetWrite.build(Seq(
      WCol("a", "i64", optional = false, IndexedSeq(Some(1L))),
      WCol("b", "i64", optional = false, IndexedSeq()))))
    intercept[IllegalArgumentException](ParquetWrite.build(Seq(
      WCol("a", "i64", optional = false, IndexedSeq(None)))))
    intercept[RuntimeException](ParquetWrite.build(Seq(
      WCol("a", "i128", optional = false, IndexedSeq(Some(1L))))))
  }

  test("an empty-but-valid file (0 rows) reads everywhere") {
    val cols = mkCols(0)
    val bytes = ParquetWrite.build(cols, "snappy")
    assert(ParquetFooter.parse(bytes).exists(_.numRows == 0))
    assert(ParquetData.decodeFile(bytes).exists(_._2
      .forall(_.isEmpty)))
    val tmp = java.nio.file.Files.createTempDirectory("graft_pw0")
    val fl = new java.io.File(tmp.toFile, "x.parquet")
    java.nio.file.Files.write(fl.toPath, bytes)
    assert(spark.read.parquet(fl.getAbsolutePath).count() == 0)
    fl.delete(); tmp.toFile.delete()
  }
}
