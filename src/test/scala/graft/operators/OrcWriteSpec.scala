package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** From-scratch ORC writer pins: files built by [[OrcWrite]]
  * (protobuf tail via our own wire helpers, byte-RLE bitmaps,
  * RLEv1 integer runs, zlib chunk framing) must read back
  * value-exactly through Spark's own ORC reader AND our
  * [[OrcData]] decoder across kinds, nulls, codecs and stripe
  * splits. */
class OrcWriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkCols(n: Int): Seq[OrcWrite.WCol] = Seq(
    OrcWrite.WCol("id", "i64", optional = false,
      (0 until n).map(i => Some(i.toLong))),
    OrcWrite.WCol("i", "i32", optional = true,
      (0 until n).map(i =>
        if (i % 7 == 3) None else Some(i - 500))),
    OrcWrite.WCol("f", "f32", optional = true,
      (0 until n).map(i =>
        if (i % 5 == 2) None else Some(i / 3f))),
    OrcWrite.WCol("d", "f64", optional = false,
      (0 until n).map(i => Some(i * 0.25 - 3.0))),
    OrcWrite.WCol("flag", "boolean", optional = true,
      (0 until n).map(i =>
        if (i % 11 == 7) None else Some(i % 3 == 0))),
    OrcWrite.WCol("s", "string", optional = true,
      (0 until n).map(i =>
        if (i % 13 == 9) None else Some(s"v${i % 23}-é$i"))),
    OrcWrite.WCol("b", "binary", optional = false,
      (0 until n).map(i =>
        Some(Array.tabulate[Byte](i % 6)(j => (i + j).toByte)))))

  test("Spark's own ORC reader reads our files value-exactly, " +
    "both codecs + multi-stripe") {
    val n = 1500
    val cols = mkCols(n)
    for ((codec, rps) <- Seq(("none", Int.MaxValue),
      ("zlib", Int.MaxValue), ("zlib", 400),
      ("snappy", Int.MaxValue), ("zstd", 500))) {
      val bytes = OrcWrite.build(cols, codec, rps)
      val tmp = java.nio.file.Files.createTempDirectory("graft_ow")
      val fl = new java.io.File(tmp.toFile, "x.orc")
      java.nio.file.Files.write(fl.toPath, bytes)
      val df = spark.read.orc(fl.getAbsolutePath)
      assert(df.schema.fieldNames.toSeq ==
        Seq("id", "i", "f", "d", "flag", "s", "b"))
      assert(df.schema("s").dataType ==
        org.apache.spark.sql.types.StringType)
      val rows = df.collect().sortBy(_.getLong(0))
      assert(rows.length == n, s"$codec/$rps")
      (0 until n by 13).foreach { i =>
        val r = rows(i)
        assert(r.getLong(0) == i.toLong)
        assert(Option(r.get(1)).map(_.asInstanceOf[Int]) ==
          cols(1).values(i), s"$codec/$rps i at $i")
        assert(Option(r.get(2)).map(_.asInstanceOf[Float]) ==
          cols(2).values(i))
        assert(r.getDouble(3) == i * 0.25 - 3.0)
        assert(Option(r.get(4)).map(_.asInstanceOf[Boolean]) ==
          cols(4).values(i), s"$codec/$rps flag at $i")
        assert(Option(r.get(5)).map(_.asInstanceOf[String]) ==
          cols(5).values(i))
        assert(r.get(6).asInstanceOf[Array[Byte]].toSeq ==
          cols(6).values(i).get.asInstanceOf[Array[Byte]].toSeq)
      }
      fl.delete(); tmp.toFile.delete()
    }
  }

  test("our OWN decoder reads our files (tail + stripes)") {
    val n = 900
    val cols = mkCols(n)
    for ((codec, rps) <- Seq(("zlib", Int.MaxValue),
      ("none", 250), ("snappy", 300), ("zstd", Int.MaxValue))) {
      val bytes = OrcWrite.build(cols, codec, rps)
      val tail = OrcTail.parseTail(bytes)
        .getOrElse(fail("our tail reader rejected our file"))
      assert(tail.numRows == n)
      if (rps < n) assert(tail.stripes.length == (n + rps - 1) / rps)
      val (leaves, vals) = OrcData.decodeFile(bytes)
        .getOrElse(fail("our stripe decoder rejected our file"))
      assert(leaves.map(_.name) ==
        Seq("id", "i", "f", "d", "flag", "s", "b"))
      (0 until n by 17).foreach { i =>
        assert(vals(0)(i).contains(i.toLong))
        assert(vals(1)(i).map(_.asInstanceOf[Long].toInt) ==
          cols(1).values(i))
        assert(vals(4)(i) == cols(4).values(i))
        assert(vals(5)(i) == cols(5).values(i))
      }
    }
  }

  test("writer rejections and 0-row files") {
    import OrcWrite.WCol
    intercept[IllegalArgumentException](OrcWrite.build(Seq(
      WCol("a", "i64", optional = false, IndexedSeq(None)))))
    intercept[RuntimeException](OrcWrite.build(Seq(
      WCol("a", "decimal", optional = false,
        IndexedSeq(Some(1L))))))
    val bytes = OrcWrite.build(mkCols(0), "zlib")
    assert(OrcTail.parseTail(bytes).exists(_.numRows == 0))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ow0")
    val fl = new java.io.File(tmp.toFile, "x.orc")
    java.nio.file.Files.write(fl.toPath, bytes)
    assert(spark.read.orc(fl.getAbsolutePath).count() == 0)
    fl.delete(); tmp.toFile.delete()
  }
}
