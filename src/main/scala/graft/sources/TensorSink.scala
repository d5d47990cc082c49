package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.operators.Safetensors
import graft.operators.Safetensors.Tensor

/** DataFrame → `.safetensors` shard tree: the WRITE half beside
  * [[TensorSource]], through this repo's own encoder — the standard
  * way to hand embeddings to the HF ecosystem. One file per
  * partition; scalar numeric/bool columns become rank-1 tensors,
  * `ArrayType` numeric columns become rank-2 `[n, d]` tensors
  * (every array in a column must have the same length — a ragged
  * "matrix" is a data bug, rejected loudly, not padded). Floats
  * write as F32/F64, integers at their width, booleans as BOOL;
  * safetensors has no null notion, so any NULL cell rejects.
  * Same distribution shape as [[ArrowSink]]: foreachPartition,
  * zero shuffles. */
object TensorSink {

  def dtypeOf(name: String, dt: DataType): String = dt match {
    case BooleanType => "BOOL"
    case ByteType => "I8"
    case ShortType => "I16"
    case IntegerType => "I32"
    case LongType => "I64"
    case FloatType => "F32"
    case DoubleType => "F64"
    case other => throw new IllegalArgumentException(
      s"TensorSink cannot write column '$name' of element type $other")
  }

  private def itemSize(dtype: String): Int = Safetensors.ItemSize(dtype)

  /** (dtype, width) per column; width 0 = scalar. */
  def specsOf(schema: StructType): Seq[(String, String, Int)] =
    schema.fields.map { f =>
      f.dataType match {
        case ArrayType(et, _) => (f.name, dtypeOf(f.name, et), -1)
        case dt => (f.name, dtypeOf(f.name, dt), 0)
      }
    }.toIndexedSeq

  private def putScalar(buf: java.nio.ByteBuffer, dtype: String,
      v: Any): Unit = dtype match {
    case "BOOL" => buf.put(if (v.asInstanceOf[Boolean]) 1.toByte
      else 0.toByte): Unit
    case "I8" => buf.put(v.asInstanceOf[Byte]): Unit
    case "I16" => buf.putShort(v.asInstanceOf[Short]): Unit
    case "I32" => buf.putInt(v.asInstanceOf[Int]): Unit
    case "I64" => buf.putLong(v.asInstanceOf[Long]): Unit
    case "F32" => buf.putFloat(v.asInstanceOf[Float]): Unit
    case "F64" => buf.putDouble(v.asInstanceOf[Double]): Unit
    case d => throw new IllegalArgumentException(s"dtype $d")
  }

  /** One partition's rows → one safetensors file's bytes. */
  private[graft] def encodePartition(schema: StructType,
      rows: Seq[Row], metadata: Map[String, String]): Array[Byte] = {
    val specs = specsOf(schema)
    val n = rows.length
    val tensors = specs.zipWithIndex.map {
      case ((name, dtype, kind), ci) =>
        if (kind == 0) {
          val buf = java.nio.ByteBuffer.allocate(n * itemSize(dtype))
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          rows.foreach { r =>
            require(!r.isNullAt(ci),
              s"NULL in column '$name' — safetensors has no nulls")
            putScalar(buf, dtype, r.get(ci))
          }
          Tensor(name, dtype, Seq(n.toLong), buf.array())
        } else {
          val width = rows.headOption.map(
            _.getAs[scala.collection.Seq[Any]](ci).length).getOrElse(0)
          val buf = java.nio.ByteBuffer.allocate(
            n * width * itemSize(dtype))
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          rows.foreach { r =>
            require(!r.isNullAt(ci),
              s"NULL in column '$name' — safetensors has no nulls")
            val xs = r.getAs[scala.collection.Seq[Any]](ci)
            require(xs.length == width,
              s"ragged array column '$name': ${xs.length} vs $width")
            xs.foreach { e =>
              require(e != null,
                s"NULL element in column '$name'")
              putScalar(buf, dtype, e)
            }
          }
          Tensor(name, dtype, Seq(n.toLong, width.toLong),
            buf.array())
        }
    }
    Safetensors.build(tensors, metadata)
  }

  /** Write `df` under `dir` as `part-<partition>%05d.safetensors`.
    * Empty partitions write no file; `dir` must be executor-writable
    * (the ArrowSink contract). */
  def write(df: DataFrame, dir: String,
      metadata: Map[String, String] = Map.empty): Unit = {
    val schema = df.schema
    specsOf(schema) // fail fast on unsupported types
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.rdd.foreachPartition { it =>
      val rows = it.toSeq
      if (rows.nonEmpty) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val bytes = encodePartition(schema, rows, metadata)
        java.nio.file.Files.write(java.nio.file.Paths.get(dir,
          f"part-$pid%05d.safetensors"), bytes)
      }
    }
  }
}
