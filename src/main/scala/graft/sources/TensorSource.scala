package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.operators.Safetensors
import graft.operators.Safetensors.Tensor

/** `.safetensors` shard trees as REAL Spark DataFrames — the
  * user-facing read path over [[graft.operators.Safetensors]],
  * completing the sources story (Arrow/Avro got theirs in r12;
  * embedding dumps deserve the same first-class API instead of a
  * hand-rolled parse per query).
  *
  * Table mapping: each file is one record batch — every tensor's
  * FIRST dimension is the row count (they must all agree), a rank-1
  * tensor is a scalar column, a rank-2 `[n, d]` tensor is an
  * `ArrayType` column of its element type (embedding matrices).
  * Rank ≥ 3 rejects loudly (no silent flattening). F16/BF16 decode
  * to Float via the shared closed-form half-float arithmetic, and
  * the F8 pair (E4M3-FN / E5M2) through the closed-form float8
  * conversions beside it — quantized activation dumps read as
  * ordinary Float columns. Column order is the file's
  * data-buffer order; safetensors has no null notion, so every
  * column is non-nullable.
  *
  * Schema comes from ONE driver-side file read (lexicographically
  * first, like Spark's own json/csv inference); every executor-side
  * file must match name/dtype/width exactly or the read fails
  * loudly — a mixed-schema shard tree is a corruption signal, not a
  * merge opportunity. Distribution shape: one binaryFile scan, a
  * flatMap decode per file, zero shuffles. */
object TensorSource {

  /** (column spec) name, dtype tag, and width (0 = scalar column). */
  final case class ColSpec(name: String, dtype: String, width: Int)

  def sparkType(dtype: String): DataType = dtype match {
    case "BOOL" => BooleanType
    case "I8" => ByteType
    case "U8" => ShortType // raw, widened
    case "I16" => ShortType
    case "U16" => IntegerType
    case "I32" => IntegerType
    case "U32" => LongType
    case "I64" | "U64" => LongType // u64 raw bits
    case "F16" | "BF16" | "F32" | "F8_E4M3" | "F8_E5M2" => FloatType
    case "F64" => DoubleType
    case t => throw new IllegalArgumentException(
      s"no Spark mapping for safetensors dtype $t")
  }

  def schemaOf(specs: Seq[ColSpec]): StructType =
    StructType(specs.map { c =>
      val base = sparkType(c.dtype)
      StructField(c.name,
        if (c.width == 0) base
        else ArrayType(base, containsNull = false),
        nullable = false)
    })

  private def specsOf(path: String, ts: Seq[Tensor])
      : (Int, Seq[ColSpec]) = {
    require(ts.nonEmpty, s"no tensors in $path")
    ts.foreach { t =>
      require(t.shape.length == 1 || t.shape.length == 2,
        s"tensor ${t.name} in $path has rank ${t.shape.length} — " +
          "only rank-1 (scalar column) and rank-2 (array column) " +
          "map to a table")
    }
    val n = ts.head.shape.head
    ts.foreach(t => require(t.shape.head == n,
      s"tensor ${t.name} in $path: first dim ${t.shape.head} != $n"))
    require(n <= Int.MaxValue, "row count overflow")
    (n.toInt, ts.map(t => ColSpec(t.name, t.dtype,
      if (t.shape.length == 1) 0 else t.shape(1).toInt)))
  }

  private def scalarAt(t: Tensor, i: Int): Any = t.dtype match {
    case "BOOL" => t.data(i) != 0
    case "I8" => t.data(i)
    case "U8" => (t.data(i) & 0xff).toShort
    case "I16" => Safetensors.i16At(t, i)
    case "U16" => Safetensors.i16At(t, i) & 0xffff
    case "I32" => Safetensors.i32At(t, i)
    case "U32" => Safetensors.i32At(t, i).toLong & 0xffffffffL
    case "I64" | "U64" => Safetensors.i64At(t, i)
    case "F16" => Safetensors.f16At(t, i)
    case "BF16" => Safetensors.bf16At(t, i)
    case "F8_E4M3" => Safetensors.f8e4m3At(t, i)
    case "F8_E5M2" => Safetensors.f8e5m2At(t, i)
    case "F32" => Safetensors.f32At(t, i)
    case "F64" => Safetensors.f64At(t, i)
    case d => throw new IllegalArgumentException(s"dtype $d")
  }

  private[graft] def fileRows(path: String, bytes: Array[Byte],
      expect: Seq[ColSpec]): Seq[Row] = {
    val (_, ts) = Safetensors.parse(bytes).getOrElse(
      throw new IllegalArgumentException(
        s"not a readable safetensors file: $path"))
    val (n, specs) = specsOf(path, ts)
    require(specs == expect,
      s"schema mismatch in $path: $specs vs expected $expect")
    (0 until n).map { i =>
      Row.fromSeq(ts.zip(specs).map { case (t, c) =>
        if (c.width == 0) scalarAt(t, i)
        else (0 until c.width).map(j =>
          scalarAt(t, i * c.width + j))
      })
    }
  }

  private def inferSpecs(spark: SparkSession, dir: String,
      glob: String): Seq[ColSpec] = {
    import spark.implicits._
    val firstPath = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select("path").as[String].orderBy("path").head()
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(firstPath)))
    val (_, ts) = Safetensors.parse(bytes).getOrElse(
      throw new IllegalArgumentException(
        s"not a readable safetensors file: $firstPath"))
    specsOf(firstPath, ts)._2
  }

  /** Read a directory of `.safetensors` files as one DataFrame. */
  def read(spark: SparkSession, dir: String,
      glob: String = "*.safetensors"): DataFrame = {
    import spark.implicits._
    val specs = inferSpecs(spark, dir, glob)
    val schema = schemaOf(specs)
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select("path", "content").as[(String, Array[Byte])]
    val rowRdd = bin.rdd.flatMap { case (path, bytes) =>
      fileRows(path, bytes, specs)
    }
    spark.createDataFrame(rowRdd, schema)
  }

  /** Streaming twin of [[read]]: schema inferred once up front from
    * an existing file; schema-mismatched arrivals fail loudly. */
  def readStream(spark: SparkSession, dir: String,
      glob: String = "*.safetensors"): DataFrame = {
    import spark.implicits._
    val specs = inferSpecs(spark, dir, glob)
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schemaOf(specs))
    val binSchema = new StructType()
      .add("path", StringType)
      .add("modificationTime", TimestampType)
      .add("length", LongType)
      .add("content", BinaryType)
    spark.readStream.format("binaryFile").schema(binSchema)
      .option("pathGlobFilter", glob).load(dir)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        fileRows(path, bytes, specs)
      }
      .toDF()
  }
}
