package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** DataFrame → `.arrow` file tree: the WRITE half of the dataset
  * interchange story ([[ArrowSource]] is the read half) — materialize
  * a corpus in the exact shape HuggingFace-datasets / Feather-v2
  * tooling consumes. One file per partition, a record batch every
  * `rowsPerBatch` rows, written through the arrow-java runtime Spark
  * already bundles (entropy-correct by construction; our own reader
  * differential-checks the round trip in SourcesSpec).
  *
  * Type subset: numeric/bool/string/binary/decimal scalars,
  * ArrayType, StructType and MapType recursively (map entries sort
  * by key string for reproducible files). Exotic scalars reject
  * loudly at schema-mapping time — never a silently-dropped
  * column.
  *
  * Distribution shape: pure foreachPartition, zero shuffles; writers
  * hold one batch of vectors in memory, so executor footprint is
  * O(rowsPerBatch · row width) regardless of partition size. */
object ArrowSink {

  import org.apache.arrow.vector._
  import org.apache.arrow.vector.complex.{ListVector, StructVector}
  import org.apache.arrow.vector.types.FloatingPointPrecision
  import org.apache.arrow.vector.types.pojo.{ArrowType, Field,
    FieldType, Schema => ASchema}
  import scala.jdk.CollectionConverters._

  /** Arrow field for a Spark field; rejects unsupported types. */
  def arrowField(name: String, dt: DataType, nullable: Boolean): Field =
    dt match {
      case BooleanType => leaf(name, ArrowType.Bool.INSTANCE, nullable)
      case ByteType    => leaf(name, new ArrowType.Int(8, true), nullable)
      case ShortType   => leaf(name, new ArrowType.Int(16, true), nullable)
      case IntegerType => leaf(name, new ArrowType.Int(32, true), nullable)
      case LongType    => leaf(name, new ArrowType.Int(64, true), nullable)
      case FloatType   => leaf(name, new ArrowType.FloatingPoint(
        FloatingPointPrecision.SINGLE), nullable)
      case DoubleType  => leaf(name, new ArrowType.FloatingPoint(
        FloatingPointPrecision.DOUBLE), nullable)
      case StringType  => leaf(name, ArrowType.Utf8.INSTANCE, nullable)
      case BinaryType  => leaf(name, ArrowType.Binary.INSTANCE, nullable)
      case ArrayType(et, containsNull) =>
        new Field(name, new FieldType(nullable, ArrowType.List.INSTANCE,
          null), Seq(arrowField("item", et, containsNull)).asJava)
      case StructType(fs) =>
        new Field(name, new FieldType(nullable,
          ArrowType.Struct.INSTANCE, null),
          fs.map(f => arrowField(f.name, f.dataType, f.nullable))
            .toSeq.asJava)
      case MapType(kt, vt, valueContainsNull) =>
        import org.apache.arrow.vector.complex.MapVector
        new Field(name, new FieldType(nullable,
          new ArrowType.Map(false), null),
          Seq(new Field(MapVector.DATA_VECTOR_NAME,
            new FieldType(false, ArrowType.Struct.INSTANCE, null),
            Seq(arrowField(MapVector.KEY_NAME, kt, nullable = false),
              arrowField(MapVector.VALUE_NAME, vt, valueContainsNull))
              .asJava)).asJava)
      case dt: DecimalType =>
        leaf(name, new ArrowType.Decimal(dt.precision, dt.scale, 128),
          nullable)
      case other => throw new IllegalArgumentException(
        s"ArrowSink cannot write column '$name' of type $other")
    }

  private def leaf(name: String, t: ArrowType, nullable: Boolean) =
    new Field(name, new FieldType(nullable, t, null), null)

  /** Recursive vector fill. For lists the child start slot comes from
    * startNewValue, so no external offset state is needed. */
  private def fill(vec: FieldVector, idx: Int, v: Any): Unit =
    if (v == null) vec match {
      case lv: ListVector   => lv.setNull(idx) // MapVector included
      case sv: StructVector => sv.setNull(idx)
      case bv: BaseFixedWidthVector    => bv.setNull(idx)
      case bv: BaseVariableWidthVector => bv.setNull(idx)
      case other => throw new IllegalArgumentException(
        s"cannot null ${other.getClass.getSimpleName}")
    } else vec match {
      case x: BigIntVector   => x.setSafe(idx, v.asInstanceOf[Long])
      case x: IntVector      => x.setSafe(idx, v.asInstanceOf[Int])
      case x: SmallIntVector => x.setSafe(idx, v.asInstanceOf[Short])
      case x: TinyIntVector  => x.setSafe(idx, v.asInstanceOf[Byte])
      case x: BitVector      =>
        x.setSafe(idx, if (v.asInstanceOf[Boolean]) 1 else 0)
      case x: Float4Vector   => x.setSafe(idx, v.asInstanceOf[Float])
      case x: Float8Vector   => x.setSafe(idx, v.asInstanceOf[Double])
      case x: VarCharVector  =>
        x.setSafe(idx, v.asInstanceOf[String].getBytes("UTF-8"))
      case x: VarBinaryVector =>
        x.setSafe(idx, v.asInstanceOf[Array[Byte]])
      case x: DecimalVector =>
        x.setSafe(idx, v.asInstanceOf[java.math.BigDecimal])
      case mv: org.apache.arrow.vector.complex.MapVector =>
        // MapVector IS a ListVector of entry structs; this case must
        // precede the ListVector one. Entries sort by key string for
        // reproducible files (Spark maps are unordered).
        val kvs = v.asInstanceOf[scala.collection.Map[Any, Any]]
          .toSeq.sortBy(_._1.toString)
        val ev = mv.getDataVector.asInstanceOf[StructVector]
        val start = mv.startNewValue(idx)
        var k = 0
        val kids = ev.getChildrenFromFields
        while (k < kvs.length) {
          ev.setIndexDefined(start + k)
          fill(kids.get(0), start + k, kvs(k)._1)
          fill(kids.get(1), start + k, kvs(k)._2)
          k += 1
        }
        mv.endValue(idx, kvs.length)
      case lv: ListVector =>
        val xs = v.asInstanceOf[scala.collection.Seq[Any]]
        val start = lv.startNewValue(idx)
        var k = 0
        while (k < xs.length) {
          fill(lv.getDataVector, start + k, xs(k))
          k += 1
        }
        lv.endValue(idx, xs.length)
      case sv: StructVector =>
        val row = v.asInstanceOf[Row]
        sv.setIndexDefined(idx)
        var k = 0
        val kids = sv.getChildrenFromFields
        while (k < kids.size()) {
          fill(kids.get(k), idx, if (row.isNullAt(k)) null else row.get(k))
          k += 1
        }
      case other => throw new IllegalArgumentException(
        s"unsupported vector ${other.getClass.getSimpleName}")
    }

  /** Write `df` under `dir` as `part-<partition>%05d.arrow` files.
    * Empty partitions write no file. */
  def write(df: DataFrame, dir: String, rowsPerBatch: Int = 4096): Unit = {
    require(rowsPerBatch > 0)
    val schema = df.schema
    val arrowSchema = new ASchema(schema.fields.map(f =>
      arrowField(f.name, f.dataType, f.nullable)).toSeq.asJava)
    val schemaJson = arrowSchema.toJson // serializable carrier
    // NOTE: `dir` must be a path every executor can write (posix/NFS
    // here; object-store staging at cluster scale) — the same
    // contract as the fixture trees throughout this repo.
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.rdd.foreachPartition { it =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val aSchema = ASchema.fromJSON(schemaJson)
        val alloc = new org.apache.arrow.memory.RootAllocator()
        try {
          val root = VectorSchemaRoot.create(aSchema, alloc)
          try {
            val path = java.nio.file.Paths.get(dir,
              f"part-$pid%05d.arrow")
            val ch = java.nio.channels.FileChannel.open(path,
              java.nio.file.StandardOpenOption.CREATE,
              java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
              java.nio.file.StandardOpenOption.WRITE)
            val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(
              root, null, ch)
            try {
              w.start()
              while (it.hasNext) {
                root.allocateNew()
                var n = 0
                while (n < rowsPerBatch && it.hasNext) {
                  val row = it.next()
                  var c = 0
                  val vecs = root.getFieldVectors
                  while (c < vecs.size()) {
                    fill(vecs.get(c), n,
                      if (row.isNullAt(c)) null else row.get(c))
                    c += 1
                  }
                  n += 1
                }
                root.setRowCount(n)
                w.writeBatch()
              }
              w.end()
            } finally { w.close(); ch.close() }
          } finally root.close()
        } finally alloc.close()
      }
    }
  }
}
