package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Parquet-footer pins: REAL files written by Spark's parquet-mr
  * path parse back with the right row counts, schema leaves,
  * codecs, encodings and row-group structure (a live differential
  * against the thrift compact serializer parquet-mr uses), codec
  * config changes surface, multi-row-group files walk, and
  * truncation/garbage fuzz never throws. */
class ParquetFooterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$tag")
      .toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/t"
  }

  private def onePart(dir: String): Array[Byte] = {
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.readAllBytes(f.toPath)
  }

  test("a Spark-written file parses: rows, leaves, codec, offsets") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("pqf")
    (0 until 1000).map(i => (i.toLong, s"v$i", i * 0.5))
      .toDF("id", "txt", "score").coalesce(1)
      .write.parquet(dir)
    val footer = ParquetFooter.parse(onePart(dir)).get
    assert(footer.numRows == 1000)
    assert(footer.schemaLeaves == Seq("id", "txt", "score"))
    assert(footer.createdBy.toLowerCase.contains("parquet"))
    assert(footer.rowGroups.map(_.numRows).sum == 1000)
    val cols = footer.rowGroups.head.columns
    assert(cols.map(_.path) == Seq("id", "txt", "score"))
    // spark default codec
    assert(cols.forall(c =>
      ParquetFooter.CodecNames(c.codecId) == "SNAPPY"))
    assert(cols.map(c =>
      ParquetFooter.TypeNames(c.typeId)) ==
      Seq("INT64", "BYTE_ARRAY", "DOUBLE"))
    assert(cols.forall(_.numValues == 1000))
    assert(cols.forall(_.totalCompressed > 0))
    assert(cols.forall(_.dataPageOffset > 0))
    assert(cols.forall(_.encodings.nonEmpty))
  }

  test("codec config surfaces; multi-row-group files walk") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("pqf_z")
    spark.conf.set("spark.sql.parquet.compression.codec", "zstd")
    try {
      // tiny row-group size forces multiple groups in one file
      (0 until 20000).map(i => (i.toLong, "x" * 50))
        .toDF("id", "pad").coalesce(1)
        .write.option("parquet.block.size", 64 * 1024).parquet(dir)
    } finally spark.conf.set(
      "spark.sql.parquet.compression.codec", "snappy")
    val footer = ParquetFooter.parse(onePart(dir)).get
    assert(footer.numRows == 20000)
    assert(footer.rowGroups.length > 1, "expected multiple row groups")
    assert(footer.rowGroups.map(_.numRows).sum == 20000)
    footer.rowGroups.foreach { g =>
      assert(g.columns.map(_.path) == Seq("id", "pad"))
      assert(g.columns.forall(c =>
        ParquetFooter.CodecNames(c.codecId) == "ZSTD"))
      assert(g.totalByteSize > 0)
    }
    // per-column value counts tile the file
    assert(footer.rowGroups.flatMap(_.columns)
      .filter(_.path == "id").map(_.numValues).sum == 20000)
  }

  test("nested columns surface as dotted leaf paths") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("pqf_n")
    Seq((1L, (2L, "a"), Seq(1, 2)))
      .toDF("id", "sub", "xs").coalesce(1).write.parquet(dir)
    val footer = ParquetFooter.parse(onePart(dir)).get
    assert(footer.schemaLeaves.contains("id"))
    // struct leaves carry their own names; list leaves the element
    val paths = footer.rowGroups.head.columns.map(_.path)
    assert(paths.exists(_.startsWith("sub.")))
    assert(paths.exists(_.startsWith("xs.")))
  }

  test("malformed footers reject, never throw") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("pqf_bad")
    Seq((1L, "x")).toDF("a", "b").coalesce(1).write.parquet(dir)
    val ok = onePart(dir)
    assert(ParquetFooter.parse(ok).isDefined)
    assert(ParquetFooter.parse(Array.emptyByteArray).isEmpty)
    assert(ParquetFooter.parse(ok.dropRight(1)).isEmpty)
    assert(ParquetFooter.parse(ok.drop(1)).isEmpty)
    val badLen = ok.clone()
    badLen(badLen.length - 5) = 0x7f // absurd footer length
    assert(ParquetFooter.parse(badLen).isEmpty)
    val rnd = new scala.util.Random(61)
    (0 until 300).foreach { _ =>
      val m = ok.clone()
      // mutate within the footer region
      val tail = math.min(m.length, 2000)
      m(m.length - 1 - rnd.nextInt(tail)) = rnd.nextInt().toByte
      ParquetFooter.parse(m)
    }
    (0 until 200).foreach { _ =>
      ParquetFooter.parse(
        Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte))
    }
  }
}
