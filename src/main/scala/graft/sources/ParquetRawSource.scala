package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.operators.ParquetData
import graft.operators.ParquetData.{DeepLeaf, DeepList, DeepNode, DeepStruct}

/** Parquet through the FROM-SCRATCH reader as a typed DataFrame —
  * the user-facing face of the audit/recovery path ([[graft
  * .operators.ParquetData]] decodes pages with no parquet-mr on
  * the read path; this maps its output to real Spark rows), the
  * same API shape [[ArrowSource]]/[[AvroSource]] give their
  * formats. Use cases: auditing that Spark's vectorized reader
  * returns what the bytes actually say, and recovering data from
  * trees a library reader refuses.
  *
  * Scope (r14, was flat-only in r13) — the full
  * [[ParquetData.decodeFileDeep]] surface: flat columns, structs,
  * 3-level lists and maps at any supported depth, surfaced as real
  * `StructType`/`ArrayType`/`MapType` columns. Logical surfacing
  * via the footer's ConvertedType at every depth: BYTE_ARRAY+UTF8
  * → StringType (else BinaryType), INT32+DATE → DateType,
  * INT64+TIMESTAMP_MICROS → TimestampType, everything else at its
  * physical width. A `columns` projection decodes ONLY the named
  * top-level columns — unprojected columns' chunks are never
  * touched (pinned by a decode-counter spec), the pushdown a
  * recovery scan of a wide table needs. Schema comes from ONE
  * driver-side footer probe through the Hadoop FileSystem (so
  * HDFS/S3 trees probe the same way local ones do); every file is
  * then footer-checked on executors and decoded per file — the
  * per-file flatMap unit a 1000-executor recovery job
  * parallelizes on. */
object ParquetRawSource {

  private final val ConvUtf8 = 0
  private final val ConvDate = 6
  private final val ConvTsMicros = 10

  private def leafType(typeId: Int, conv: Int): DataType =
    (typeId, conv) match {
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

  /** The Spark field of one schema node, recursively. */
  private[graft] def nodeField(n: DeepNode): StructField = n match {
    case l: DeepLeaf =>
      StructField(l.name, leafType(l.typeId, l.conv),
        nullable = l.optional)
    case s: DeepStruct =>
      StructField(s.name, StructType(s.fields.map(nodeField)),
        nullable = s.optional)
    case l: DeepList if !l.isMap =>
      val e = nodeField(l.elem)
      StructField(l.name, ArrayType(e.dataType, e.nullable),
        nullable = l.optional)
    case m: DeepList =>
      val kv = m.elem match {
        case s: DeepStruct if s.fields.length == 2 => s
        case _ => sys.error(s"malformed MAP group ${m.name}")
      }
      val k = nodeField(kv.fields.head)
      val v = nodeField(kv.fields(1))
      StructField(m.name,
        MapType(k.dataType, v.dataType, v.nullable),
        nullable = m.optional)
  }

  private def toSparkLeaf(v: Any, dt: DataType): Any =
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

  /** One decoded slot → the Spark-external value (Row / Seq / Map
    * / boxed scalar), recursively. */
  private[graft] def toSpark(v: Option[Any], n: DeepNode): Any =
    v match {
      case None => null
      case Some(x) => n match {
        case l: DeepLeaf =>
          toSparkLeaf(x, leafType(l.typeId, l.conv))
        case s: DeepStruct =>
          val fvs = x.asInstanceOf[Seq[Option[Any]]]
          require(fvs.length == s.fields.length,
            s"struct ${s.name} arity drift")
          Row.fromSeq(s.fields.zip(fvs).map {
            case (f, fv) => toSpark(fv, f) })
        case l: DeepList if !l.isMap =>
          x.asInstanceOf[Seq[Option[Any]]].map(toSpark(_, l.elem))
        case m: DeepList =>
          val kv = m.elem.asInstanceOf[DeepStruct]
          x.asInstanceOf[Seq[Option[Any]]].map { entry =>
            val e = entry.getOrElse(
              sys.error(s"null map entry in ${m.name}"))
              .asInstanceOf[Seq[Option[Any]]]
            val k = toSpark(e.head, kv.fields.head)
            require(k != null, s"null map key in ${m.name}")
            k -> toSpark(e(1), kv.fields(1))
          }.toMap
      }
    }

  /** Whole-file bytes through the Hadoop FileSystem — the probe
    * works wherever the scan does (file:, hdfs:, s3a:, …). */
  private def readFileBytes(spark: SparkSession, path: String)
      : Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream(1 << 16)
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** Read a directory of parquet files as one DataFrame through
    * the from-scratch decoder. `columns` non-empty = decode only
    * those top-level columns (returned in schema order); other
    * columns' pages are never decoded. */
  def read(spark: SparkSession, dir: String,
      glob: String = "*.parquet",
      columns: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    val project: Option[Set[String]] =
      if (columns.isEmpty) None else Some(columns.toSet)
    val firstPath = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select("path").as[String].orderBy("path").head()
    val foot = graft.operators.ParquetFooter
      .parse(readFileBytes(spark, firstPath)).getOrElse(
        sys.error(s"not a readable parquet file: $firstPath"))
    val all = ParquetData.deepSchema(foot).getOrElse(
      sys.error(s"unsupported schema shape in $firstPath"))
    project.foreach { keep =>
      val missing = keep -- all.map(_.name).toSet
      require(missing.isEmpty,
        s"projected columns not in $firstPath: " +
          missing.toSeq.sorted.mkString(", "))
    }
    val nodes0 = project match {
      case None => all
      case Some(keep) => all.filter(n => keep(n.name))
    }
    val schema = StructType(nodes0.map(nodeField))
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select("path", "content").as[(String, Array[Byte])]
    val rowRdd = bin.rdd.flatMap { case (path, bytes) =>
      val (nodes, cols) = ParquetData
        .decodeFileDeep(bytes, project).getOrElse(
          sys.error(s"data pages do not decode: $path"))
      require(nodes == nodes0, s"schema drift in $path")
      val n = cols.headOption.map(_.length).getOrElse(0)
      (0 until n).iterator.map { r =>
        Row.fromSeq(nodes0.indices.map(c =>
          toSpark(cols(c)(r), nodes0(c))))
      }
    }
    spark.createDataFrame(rowRdd, schema)
  }
}
