package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.operators.ArrowIpc

/** `.arrow` shard trees as REAL Spark DataFrames — the user-facing
  * read path over [[graft.operators.ArrowIpc]]: list columns become
  * `ArrayType`, structs become `StructType`, dictionary-encoded
  * columns surface as their VALUE type (indices never escape),
  * temporal columns surface as their raw counts (documented on the
  * tag names), unsigned ints surface raw in the next-wider signed
  * slot Spark has. Schema comes from ONE driver-side file read (the
  * lexicographically first — the same one-file inference Spark's own
  * json/csv readers do); every executor-side file must then match it
  * exactly or the read fails loudly (mixed-schema trees are a
  * corruption signal in shard corpora, not a merge opportunity).
  *
  * Distribution shape: one binaryFile scan, a flatMap parse per
  * file, zero shuffles — the RDD hop exists only because the row
  * schema is dynamic (Dataset encoders are compile-time). At 100 TB
  * this is the same embarrassingly-parallel walk as every other
  * container source here. */
object ArrowSource {

  /** Spark type for one decoded column. */
  def sparkType(c: ArrowIpc.Col): DataType =
    if (c.tag.startsWith("fixed_binary_")) BinaryType
    else c.tag match {
      case "bool" => BooleanType
      case "int8" => ByteType
      case "uint8" => ShortType // raw, widened
      case "int16" => ShortType
      case "uint16" => IntegerType
      case "int32" | "date32" | "time32_s" | "time32_ms" => IntegerType
      case "uint32" => LongType
      case "int64" | "uint64" => LongType
      case t if t.startsWith("timestamp_") || t.startsWith("time64_") ||
        t.startsWith("duration_") || t == "date64" => LongType
      case "float32" => FloatType
      case "float64" => DoubleType
      case "utf8" | "large_utf8" => StringType
      case "binary" | "large_binary" => BinaryType
      case "list" | "large_list" | "fixed_list" =>
        val k = c.children.head
        ArrayType(sparkType(k), containsNull = k.nullable)
      case "struct" => StructType(c.children.map(k =>
        StructField(k.name, sparkType(k), nullable = k.nullable)))
      case "map" =>
        val entries = c.children.head
        val key = entries.children(0)
        val value = entries.children(1)
        MapType(sparkType(key), sparkType(value),
          valueContainsNull = value.nullable)
      case t if t.startsWith("decimal") =>
        // tag is decimal<bits>_<precision>_<scale>
        val parts = t.split('_')
        val prec = parts(1).toInt
        val scale = parts(2).toInt
        if (prec > DecimalType.MAX_PRECISION)
          throw new IllegalArgumentException(
            s"decimal precision $prec exceeds Spark's maximum")
        DecimalType(prec, scale)
      case "union_sparse" | "union_dense" =>
        // policy, not a parser gap: the raw ArrowIpc reader decodes
        // unions (late r14), but Spark has no union type to carry
        // them — fail with intent rather than a generic unmapped tag
        throw new IllegalArgumentException(
          "arrow union columns have no Spark type; decode them via " +
            "ArrowIpc.parseFile/parseStream")
      case t => throw new IllegalArgumentException(s"unmapped tag $t")
    }

  def schemaOf(cols: Seq[ArrowIpc.Col]): StructType =
    StructType(cols.map(c =>
      StructField(c.name, sparkType(c), nullable = c.nullable)))

  /** One decoded value → the Spark-facing value (Options unwrapped,
    * nested Seq[Option[_]] → Seq / Row). */
  private def toSpark(c: ArrowIpc.Col, v: Option[Any]): Any = v match {
    case None => null
    case Some(x) => c.tag match {
      case "list" | "large_list" | "fixed_list" =>
        val k = c.children.head
        x.asInstanceOf[Seq[Option[Any]]].map(e => toSpark(k, e))
      case "struct" =>
        Row.fromSeq(c.children.zip(x.asInstanceOf[Seq[Option[Any]]])
          .map { case (k, e) => toSpark(k, e) })
      case "map" =>
        val entries = c.children.head
        val key = entries.children(0)
        val value = entries.children(1)
        x.asInstanceOf[Seq[Option[Any]]].map { e =>
          val kv = e.get.asInstanceOf[Seq[Option[Any]]]
          (toSpark(key, kv(0)), toSpark(value, kv(1)))
        }.toMap
      case _ => x
    }
  }

  private[graft] def toRow(cols: Seq[ArrowIpc.Col],
      r: ArrowIpc.Row): Row =
    Row.fromSeq(cols.zip(r).map { case (c, v) => toSpark(c, v) })

  /** Schema inference: parse ONE existing file (lexicographically
    * first) on the driver. */
  private def inferCols(spark: SparkSession, dir: String,
      glob: String): Seq[ArrowIpc.Col] = {
    import spark.implicits._
    val firstPath = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select("path").as[String].orderBy("path").head()
    val firstBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(firstPath)))
    ArrowIpc.parseFile(firstBytes) match {
      case Some((cs, _)) => cs
      case None => throw new IllegalArgumentException(
        s"not a readable Arrow file: $firstPath")
    }
  }

  /** Read a directory of `.arrow` files as one DataFrame. */
  def read(spark: SparkSession, dir: String,
      glob: String = "*.arrow"): DataFrame = {
    import spark.implicits._
    val cols = inferCols(spark, dir, glob)
    val schema = schemaOf(cols)
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select("path", "content").as[(String, Array[Byte])]
    val rowRdd = bin.rdd.flatMap { case (path, bytes) =>
      val (cs, rows) = ArrowIpc.parseFile(bytes).getOrElse(
        throw new IllegalArgumentException(
          s"not a readable Arrow file: $path"))
      require(cs == cols,
        s"schema mismatch in $path: $cs vs expected $cols")
      rows.map(r => toRow(cs, r))
    }
    spark.createDataFrame(rowRdd, schema)
  }

  /** Streaming twin of [[read]]: the schema is inferred ONCE from an
    * existing file at call time (a streaming query needs its schema
    * up front), then every arriving file parses through the same
    * conversion; a schema-mismatched arrival fails the stream
    * loudly. */
  def readStream(spark: SparkSession, dir: String,
      glob: String = "*.arrow"): DataFrame = {
    import spark.implicits._
    val cols = inferCols(spark, dir, glob)
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schemaOf(cols))
    val binSchema = new StructType()
      .add("path", StringType)
      .add("modificationTime", TimestampType)
      .add("length", LongType)
      .add("content", BinaryType)
    spark.readStream.format("binaryFile").schema(binSchema)
      .option("pathGlobFilter", glob).load(dir)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val (cs, rows) = ArrowIpc.parseFile(bytes).getOrElse(
          throw new IllegalArgumentException(
            s"not a readable Arrow file: $path"))
        require(cs == cols,
          s"schema mismatch in $path: $cs vs expected $cols")
        rows.map(r => toRow(cs, r))
      }
      .toDF()
  }
}
