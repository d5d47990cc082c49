package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.operators.Avro

/** DataFrame → `.avro` container tree: the WRITE half beside
  * [[AvroSource]], through this repo's own pure-JVM Avro writer
  * (avro-java reads the output back — pinned in AvroSpec/SourcesSpec).
  * One container per partition, `blockRows` rows per sync-framed
  * block, any of the six spec codecs.
  *
  * Type mapping: numeric/bool/string/binary scalars; ArrayType →
  * avro array (nullable items as the ["null",X] union); MapType with
  * STRING keys → avro map; StructType → nested record. Anything else
  * rejects loudly at schema-mapping time. Same distribution shape as
  * [[ArrowSink]]: foreachPartition, zero shuffles. */
object AvroSink {

  /** Avro type for a Spark type; rejects unsupported types. */
  def avroType(name: String, dt: DataType): Avro.NType = dt match {
    case BooleanType => Avro.NPrim("boolean")
    case IntegerType => Avro.NPrim("int")
    case LongType    => Avro.NPrim("long")
    case FloatType   => Avro.NPrim("float")
    case DoubleType  => Avro.NPrim("double")
    case StringType  => Avro.NPrim("string")
    case BinaryType  => Avro.NPrim("bytes")
    case ByteType | ShortType => Avro.NPrim("int") // avro has no narrow ints
    case DateType => Avro.NLogical("int", "date")
    case TimestampType => Avro.NLogical("long", "timestamp-micros")
    case TimestampNTZType =>
      Avro.NLogical("long", "local-timestamp-micros")
    case dt: DecimalType =>
      Avro.NLogical("bytes", "decimal", dt.precision, dt.scale)
    case ArrayType(et, containsNull) =>
      Avro.NArr(avroType(s"${name}_item", et), containsNull)
    case MapType(StringType, vt, valueContainsNull) =>
      Avro.NMap(avroType(s"${name}_value", vt), valueContainsNull)
    case StructType(fs) => Avro.NRec(name, fs.map(f =>
      Avro.NField(f.name, avroType(f.name, f.dataType), f.nullable))
      .toSeq)
    case other => throw new IllegalArgumentException(
      s"AvroSink cannot write column '$name' of type $other")
  }

  def fieldsOf(schema: StructType): Seq[Avro.NField] =
    schema.fields.map(f => Avro.NField(f.name,
      avroType(f.name, f.dataType), f.nullable)).toSeq

  /** One Spark value → the writer's value shape. */
  private def toAvro(t: Avro.NType, v: Any): Any = t match {
    case Avro.NArr(items, _) =>
      v.asInstanceOf[scala.collection.Seq[Any]]
        .map(e => Option(e).map(toAvro(items, _))).toSeq: Seq[Option[Any]]
    case Avro.NMap(values, _) =>
      v.asInstanceOf[scala.collection.Map[String, Any]]
        .map { case (k, e) => k -> Option(e).map(toAvro(values, _)) }
        .toSeq: Seq[(String, Option[Any])]
    case Avro.NRec(_, fields) =>
      val row = v.asInstanceOf[Row]
      fields.zipWithIndex.map { case (f, i) =>
        if (row.isNullAt(i)) None else Some(toAvro(f.tpe, row.get(i)))
      }: Avro.Row
    case Avro.NPrim("int") => v match {
      case b: Byte  => b.toInt
      case s: Short => s.toInt
      case i        => i
    }
    case Avro.NLogical(_, "date", _, _, _) => v match {
      case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
      case d: java.time.LocalDate => d.toEpochDay.toInt
      case other => other
    }
    case Avro.NLogical(_, "timestamp-micros", _, _, _) => v match {
      case t: java.sql.Timestamp =>
        Math.multiplyExact(t.toInstant.getEpochSecond, 1000000L) +
          t.toInstant.getNano / 1000L
      case t: java.time.Instant =>
        Math.multiplyExact(t.getEpochSecond, 1000000L) +
          t.getNano / 1000L
      case other => other
    }
    case Avro.NLogical(_, "local-timestamp-micros", _, _, _) => v match {
      case t: java.time.LocalDateTime =>
        Math.multiplyExact(
          t.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L) +
          t.getNano / 1000L
      case other => other
    }
    case Avro.NLogical(_, "decimal", _, s, _) =>
      // unscaled big-endian two's complement at the DECLARED scale
      v.asInstanceOf[java.math.BigDecimal]
        .setScale(s).unscaledValue.toByteArray
    case _ => v
  }

  private[graft] def toAvroRow(fields: Seq[Avro.NField],
      row: Row): Avro.Row =
    fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) None else Some(toAvro(f.tpe, row.get(i)))
    }

  /** Write `df` under `dir` as `part-<partition>%05d.avro` files.
    * Empty partitions write no file; `dir` must be executor-writable
    * (the ArrowSink contract). */
  def write(df: DataFrame, dir: String, codec: String = "deflate",
      blockRows: Int = 1000, recordName: String = "row"): Unit = {
    require(Avro.Codecs(codec), s"codec $codec")
    val nfields = fieldsOf(df.schema)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.rdd.foreachPartition { it =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val rows = it.map(r => toAvroRow(nfields, r)).toSeq
        val bytes = Avro.buildNested(recordName, nfields, rows, codec,
          blockRows)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, f"part-$pid%05d.avro"), bytes)
      }
    }
  }
}
