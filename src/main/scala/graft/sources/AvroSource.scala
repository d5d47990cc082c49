package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.operators.Avro

/** `.avro` container trees as REAL Spark DataFrames — the user-facing
  * read path over [[graft.operators.Avro]]: arrays become
  * `ArrayType`, maps `MapType` (string keys per the Avro spec),
  * enums surface as their symbol strings, fixed as binary, nested
  * records as `StructType`. Same design as [[ArrowSource]]: schema
  * from one driver-side file, executor files must match exactly, one
  * binaryFile scan + flatMap parse, zero shuffles. */
object AvroSource {

  def sparkType(t: Avro.NType): DataType = t match {
    case Avro.NPrim("boolean") => BooleanType
    case Avro.NPrim("int")     => IntegerType
    case Avro.NPrim("long")    => LongType
    case Avro.NPrim("float")   => FloatType
    case Avro.NPrim("double")  => DoubleType
    case Avro.NPrim("bytes")   => BinaryType
    case Avro.NPrim("string")  => StringType
    case Avro.NPrim(p) =>
      throw new IllegalArgumentException(s"unmapped prim $p")
    case Avro.NLogical(_, "date", _, _, _) => DateType
    case Avro.NLogical(_, "timestamp-millis", _, _, _) |
         Avro.NLogical(_, "timestamp-micros", _, _, _) => TimestampType
    case Avro.NLogical(_, "local-timestamp-millis", _, _, _) |
         Avro.NLogical(_, "local-timestamp-micros", _, _, _) =>
      TimestampNTZType
    case Avro.NLogical(_, "uuid", _, _, _) => StringType
    case Avro.NLogical(_, "decimal", p, s, _) => DecimalType(p, s)
    case Avro.NLogical(prim, _, _, _, _) =>
      sparkType(Avro.NPrim(prim)) // time-millis/micros: raw counts
    case Avro.NArr(items, itemsNullable) =>
      ArrayType(sparkType(items), containsNull = itemsNullable)
    case Avro.NMap(values, valuesNullable) =>
      MapType(StringType, sparkType(values),
        valueContainsNull = valuesNullable)
    case _: Avro.NEnum => StringType
    case _: Avro.NFixed => BinaryType
    case _: Avro.NUnion =>
      // policy, not a parser gap: the raw Avro reader decodes
      // general unions (late r14) but Spark has no union type
      throw new IllegalArgumentException(
        "avro general-union columns have no Spark type; decode " +
          "them via Avro.parse")
    case Avro.NRec(_, fields) => StructType(fields.map(f =>
      StructField(f.name, sparkType(f.tpe), nullable = f.nullable)))
  }

  def schemaOf(fields: Seq[Avro.NField]): StructType =
    StructType(fields.map(f =>
      StructField(f.name, sparkType(f.tpe), nullable = f.nullable)))

  private def toSpark(t: Avro.NType, v: Any): Any = t match {
    case Avro.NArr(items, _) =>
      v.asInstanceOf[Seq[Option[Any]]]
        .map(_.map(toSpark(items, _)).orNull)
    case Avro.NMap(values, _) =>
      v.asInstanceOf[Seq[(String, Option[Any])]]
        .map { case (k, x) => k -> x.map(toSpark(values, _)).orNull }
        .toMap
    case Avro.NRec(_, fields) =>
      Row.fromSeq(fields.zip(v.asInstanceOf[Avro.Row]).map {
        case (f, x) => x.map(toSpark(f.tpe, _)).orNull })
    case Avro.NLogical(_, "date", _, _, _) =>
      java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)
    case Avro.NLogical(_, "timestamp-millis", _, _, _) =>
      java.time.Instant.ofEpochMilli(v.asInstanceOf[Long])
    case Avro.NLogical(_, "timestamp-micros", _, _, _) =>
      val us = v.asInstanceOf[Long]
      java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
    case Avro.NLogical(_, "local-timestamp-millis", _, _, _) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(v.asInstanceOf[Long], 1000L),
        Math.floorMod(v.asInstanceOf[Long], 1000L).toInt * 1000000,
        java.time.ZoneOffset.UTC)
    case Avro.NLogical(_, "local-timestamp-micros", _, _, _) =>
      val us = v.asInstanceOf[Long]
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L).toInt * 1000,
        java.time.ZoneOffset.UTC)
    case Avro.NLogical(_, "decimal", _, s, _) =>
      // big-endian two's-complement unscaled bytes at the schema's
      // scale (the spec's bytes-decimal form)
      new java.math.BigDecimal(
        new java.math.BigInteger(v.asInstanceOf[Array[Byte]]), s)
    case _ => v
  }

  private[graft] def toRow(fields: Seq[Avro.NField],
      r: Avro.Row): Row =
    Row.fromSeq(fields.zip(r).map { case (f, v) =>
      v.map(toSpark(f.tpe, _)).orNull })

  /** Schema inference: parse ONE existing file on the driver. */
  private def inferFields(spark: SparkSession, dir: String,
      glob: String): Seq[Avro.NField] = {
    import spark.implicits._
    val firstPath = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select("path").as[String].orderBy("path").head()
    val firstBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(firstPath)))
    Avro.parse(firstBytes) match {
      case Some(f) => f.nfields
      case None => throw new IllegalArgumentException(
        s"not a readable Avro container: $firstPath")
    }
  }

  /** Read a directory of `.avro` container files as one DataFrame. */
  def read(spark: SparkSession, dir: String,
      glob: String = "*.avro"): DataFrame = {
    import spark.implicits._
    val nfields = inferFields(spark, dir, glob)
    val schema = schemaOf(nfields)
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select("path", "content").as[(String, Array[Byte])]
    val rowRdd = bin.rdd.flatMap { case (path, bytes) =>
      val f = Avro.parse(bytes).getOrElse(
        throw new IllegalArgumentException(
          s"not a readable Avro container: $path"))
      require(f.nfields == nfields,
        s"schema mismatch in $path: ${f.nfields} vs $nfields")
      f.rows.map(r => toRow(f.nfields, r))
    }
    spark.createDataFrame(rowRdd, schema)
  }

  /** Streaming twin of [[read]] — see
    * [[ArrowSource.readStream]] for the design. */
  def readStream(spark: SparkSession, dir: String,
      glob: String = "*.avro"): DataFrame = {
    import spark.implicits._
    val nfields = inferFields(spark, dir, glob)
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schemaOf(nfields))
    val binSchema = new StructType()
      .add("path", StringType)
      .add("modificationTime", TimestampType)
      .add("length", LongType)
      .add("content", BinaryType)
    spark.readStream.format("binaryFile").schema(binSchema)
      .option("pathGlobFilter", glob).load(dir)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val f = Avro.parse(bytes).getOrElse(
          throw new IllegalArgumentException(
            s"not a readable Avro container: $path"))
        require(f.nfields == nfields,
          s"schema mismatch in $path: ${f.nfields} vs $nfields")
        f.rows.map(r => toRow(f.nfields, r))
      }
      .toDF()
  }
}
