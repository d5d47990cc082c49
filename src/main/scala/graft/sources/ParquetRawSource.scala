package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.operators.{ParquetData, ParquetFooter}

/** Parquet through the FROM-SCRATCH reader as a typed DataFrame —
  * the user-facing face of the audit/recovery path ([[graft
  * .operators.ParquetData]] decodes pages with no parquet-mr on
  * the read path; this maps its output to real Spark rows), the
  * same API shape [[ArrowSource]]/[[AvroSource]] give their
  * formats. Use cases: auditing that Spark's vectorized reader
  * returns what the bytes actually say, and recovering data from
  * trees a library reader refuses.
  *
  * Scope — flat schemas, the seven physical types; logical
  * surfacing via the footer's ConvertedType: BYTE_ARRAY+UTF8 →
  * StringType (else BinaryType), INT32+DATE → DateType,
  * INT64+TIMESTAMP_MICROS → TimestampType, everything else at its
  * physical width. Nested shapes reject loudly with a pointer at
  * [[ParquetData.decodeFileDeep]] (their typed surfacing is the
  * engine's normal Spark reader's job). Schema comes from ONE
  * driver-side footer probe; every file is then footer-checked on
  * executors and decoded per file — the per-file flatMap unit a
  * 1000-executor recovery job parallelizes on. */
object ParquetRawSource {

  private final val ConvUtf8 = 0
  private final val ConvDate = 6
  private final val ConvTsMicros = 10

  private[graft] def sparkField(l: ParquetData.LeafInfo,
      conv: Int): StructField = {
    val t = (l.typeId, conv) match {
      case (0, _) => BooleanType
      case (1, ConvDate) => DateType
      case (1, _) => IntegerType
      case (2, ConvTsMicros) => TimestampType
      case (2, _) => LongType
      case (3, _) => TimestampType // INT96: the legacy ts physical
      case (4, _) => FloatType
      case (5, _) => DoubleType
      case (6, ConvUtf8) => StringType
      case (6, _) | (7, _) => BinaryType
      case (other, _) =>
        sys.error(s"unsupported physical type $other")
    }
    StructField(l.name, t, nullable = l.optional)
  }

  private[graft] def toSpark(v: Any, dt: DataType): Any =
    (dt, v) match {
      case (_, null) => null
      case (BooleanType, b: Boolean) => b
      case (IntegerType, l: Long) => l.toInt
      case (IntegerType, i: Int) => i
      case (LongType, l: Long) => l
      case (LongType, i: Int) => i.toLong
      case (FloatType, f: Float) => f
      case (DoubleType, d: Double) => d
      case (StringType, b: Array[Byte]) => new String(b, "UTF-8")
      case (BinaryType, b: Array[Byte]) => b
      case (DateType, l: Long) =>
        java.sql.Date.valueOf(java.time.LocalDate
          .ofEpochDay(l))
      case (DateType, i: Int) =>
        java.sql.Date.valueOf(java.time.LocalDate
          .ofEpochDay(i.toLong))
      case (TimestampType, l: Long) =>
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(l, 1000000L),
          Math.floorMod(l, 1000000L) * 1000L))
      case (TimestampType, b: Array[Byte]) =>
        // INT96 nanos-of-day + Julian day -> epoch micros
        val mi = ParquetData.int96ToMicros(b).getOrElse(
          sys.error("INT96 value is not a plausible timestamp"))
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(mi, 1000000L),
          Math.floorMod(mi, 1000000L) * 1000L))
      case (t, x) =>
        sys.error(s"value ${x.getClass.getName} for $t")
    }

  /** (leaves, converted types) of one file, flat-or-reject. */
  private def probe(bytes: Array[Byte], what: String)
      : (Seq[ParquetData.LeafInfo], Seq[Int]) = {
    val foot = ParquetFooter.parse(bytes).getOrElse(
      sys.error(s"not a readable parquet file: $what"))
    val leaves = ParquetData.flatLeaves(foot).getOrElse(
      sys.error(s"nested schema in $what — this source surfaces " +
        "FLAT files; decode nested shapes with " +
        "ParquetData.decodeFileDeep"))
    val convs = foot.schemaElems.tail
      .filter(_.numChildren == 0).map(_.convertedType)
    require(convs.length == leaves.length,
      s"schema walk disagreement in $what")
    (leaves, convs)
  }

  /** Read a directory of parquet files as one DataFrame through
    * the from-scratch decoder. */
  def read(spark: SparkSession, dir: String,
      glob: String = "*.parquet"): DataFrame = {
    import spark.implicits._
    val firstPath = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select("path").as[String].orderBy("path").head()
    val firstBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(firstPath)))
    val (leaves0, convs0) = probe(firstBytes, firstPath)
    val schema = StructType(leaves0.zip(convs0).map {
      case (l, cv) => sparkField(l, cv) })
    val expect = leaves0.map(l => (l.name, l.typeId))
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select("path", "content").as[(String, Array[Byte])]
    val rowRdd = bin.rdd.flatMap { case (path, bytes) =>
      val (leaves, _) = probe(bytes, path)
      require(leaves.map(l => (l.name, l.typeId)) == expect,
        s"schema drift in $path")
      val (_, cols) = ParquetData.decodeFile(bytes).getOrElse(
        sys.error(s"data pages do not decode: $path"))
      val n = cols.headOption.map(_.length).getOrElse(0)
      (0 until n).iterator.map { r =>
        Row.fromSeq(schema.fields.indices.map { c =>
          cols(c)(r).map(v =>
            toSpark(v, schema.fields(c).dataType)).orNull
        })
      }
    }
    spark.createDataFrame(rowRdd, schema)
  }
}
