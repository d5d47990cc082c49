package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** tensor/scientific + Arrow/TFRecord formats — the Tensor slice of the [[Pipeline]]
  * catalog (round-13 split: pure moves out of the former
  * single-file Pipeline.scala; composed back via
  * `object Pipeline extends ...`). */
private[graft] trait PipelineTensorPart extends Serializable { this: Pipeline.type =>
  /** avro_parse / avro_parse_files shared oracle: every fact the
    * Spark side re-derives from decoded rows, predicted straight
    * from `documents` — the codec rotation by shard, the null union
    * branch every 11th doc, the quarter-step score (exact in binary,
    * no rounding needed). */
  /** Arrow IPC shard walk (operators/ArrowIpc) — the HuggingFace-
    * datasets interchange format as a live in-gate differential: the
    * WRITE side is arrow-java (the columnar runtime Spark itself uses
    * for pandas interop), 8-doc files with int64/utf8/nullable-utf8/
    * float64 columns; the READ side is OUR from-scratch flatbuffer
    * walker + columnar decode. Every fact re-derived from DECODED
    * values, so vtables, validity bitmaps, offset buffers and IEEE
    * floats must all be value-transparent. Same shuffle shape as
    * tar_parse. */
  private[graft] def arrowIpcParse(s: SparkSession, dir: String): DataFrame =
    arrowShardRows(arrowShards(s, dir)).orderBy("doc_id")
  /** The per-shard Arrow files: (shard_id, bytes), arrow-java-built. */
  private[graft] def arrowShards(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) => (id / 8, id, t) }
      .groupByKey(_._1)
      .mapGroups { (sid: Long, it: Iterator[(Long, Long, String)]) =>
        val docs = it.toSeq.sortBy(_._2)
        (sid, buildArrowShard(docs.map { case (_, id, t) => (id, t) }))
      }
  }
  /** Shared parse stage: our flatbuffer walker over (shard, bytes)
    * rows — reused verbatim by the batch, file and streaming paths. */
  private[graft] def arrowShardRows(
      shards: org.apache.spark.sql.Dataset[(Long, Array[Byte])])
      : DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    shards
      .flatMap { case (sid, bytes) =>
        val (cols, rows) = graft.operators.ArrowIpc.parseFile(bytes)
          .getOrElse(sys.error(s"arrow parse rejected shard $sid"))
        require(cols.map(_.tag) ==
          Seq("int64", "utf8", "utf8", "float64"))
        rows.map { r =>
          val id = r(0).get.asInstanceOf[Long]
          val text = r(1).get.asInstanceOf[String]
          val d = java.security.MessageDigest.getInstance("MD5")
          (id, sid, text.length.toLong,
            d.digest(text.getBytes("UTF-8")).map("%02x".format(_))
              .mkString,
            r(2).map(_.asInstanceOf[String]),
            r(3).get.asInstanceOf[Double])
        }
      }
      .toDF("doc_id", "shard_id", "len", "md5", "label", "score")
  }
  /** Builds (idempotently) and returns the `.arrow` shard fixture
    * directory — shared with the streaming parity spec. */
  private[graft] def arrowFixtureRoot(s: SparkSession, dir: String)
      : String = {
    val spark = s
    import spark.implicits._
    formatFixtureDir(dir, "arrowshard", "documents") { out =>
      arrowShards(s, dir)
        .map { case (sid, bytes) =>
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.arrow"), bytes)
          sid
        }
        .count(): Unit
    }
  }
  /** [[arrowIpcParse]] through REAL `.arrow` FILES: written once per
    * corpus to a fixture tree (executor-side), read back through the
    * distributed binaryFile source and walked per file. Identical
    * oracle — the file layer must be transparent. */
  private[graft] def arrowIpcFiles(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val root = arrowFixtureRoot(s, dir)
    arrowShardRows(
      s.read.format("binaryFile").option("pathGlobFilter", "*.arrow").load(root)
        .repartition(col("path"))
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])]
        .map { case (path, bytes) =>
          val name = path.substring(path.lastIndexOf('/') + 1)
          (name.stripPrefix("shard-").stripSuffix(".arrow").toLong, bytes)
        })
      .orderBy("doc_id")
  }
  /** [[arrowIpcParse]] with BODY-COMPRESSED shards (r12): arrow-java
    * writes ZSTD BodyCompression (the pyarrow Feather-v2 compression
    * shape) and OUR reader decodes every buffer envelope through the
    * repo's own pure-JVM Zstd decoder; identical oracle — the
    * compression layer must be invisible. LZ4_FRAME bodies are
    * covered by the ArrowIpcSpec differential instead of the gate:
    * the only available independent WRITE side (commons-compress
    * FramedLZ4 via arrow-java) allocates per tiny frame badly enough
    * to dominate the suite (measured 5-9 s vs 0.66 s for the same
    * shards under zstd-jni — the r11 per-shard-codec-setup lesson on
    * the write side). */
  private[graft] def arrowIpcCompressed(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    arrowShardRows(
      asciiDocs(s, dir)
        .map { case (id, t) => (id / 8, id, t) }
        .groupByKey(_._1)
        .mapGroups { (sid: Long, it: Iterator[(Long, Long, String)]) =>
          val docs = it.toSeq.sortBy(_._2)
          (sid, buildArrowShard(docs.map { case (_, id, t) => (id, t) },
            compressEvenZstd = Some(true)))
        })
      .orderBy("doc_id")
  }
  /** One 8-doc Arrow file via the bundled arrow-java writer.
    * `compressEvenZstd`: None = uncompressed; Some(true) = ZSTD body
    * compression; Some(false) = LZ4_FRAME. */
  private[graft] def buildArrowShard(docs: Seq[(Long, String)],
      compressEvenZstd: Option[Boolean] = None): Array[Byte] = {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field,
      FieldType, Schema => ASchema}
    import org.apache.arrow.vector.types.FloatingPointPrecision
    import org.apache.arrow.vector._
    import scala.jdk.CollectionConverters._
    def f(name: String, t: ArrowType, nullable: Boolean) =
      new Field(name, new FieldType(nullable, t, null), null)
    val schema = new ASchema(Seq(
      f("id", new ArrowType.Int(64, true), nullable = false),
      f("text", ArrowType.Utf8.INSTANCE, nullable = false),
      f("label", ArrowType.Utf8.INSTANCE, nullable = true),
      f("score", new ArrowType.FloatingPoint(
        FloatingPointPrecision.DOUBLE), nullable = false)).asJava)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val root = VectorSchemaRoot.create(schema, alloc)
      try {
        root.allocateNew()
        val ids = root.getVector("id").asInstanceOf[BigIntVector]
        val txt = root.getVector("text").asInstanceOf[VarCharVector]
        val lab = root.getVector("label").asInstanceOf[VarCharVector]
        val sc = root.getVector("score").asInstanceOf[Float8Vector]
        docs.zipWithIndex.foreach { case ((id, t), i) =>
          ids.setSafe(i, id)
          txt.setSafe(i, t.getBytes("UTF-8"))
          if (id % 11 == 10) lab.setNull(i)
          else lab.setSafe(i, s"label${id % 4}".getBytes("UTF-8"))
          sc.setSafe(i, t.length * 0.25)
        }
        root.setRowCount(docs.length)
        val buf = new java.io.ByteArrayOutputStream()
        val ch = java.nio.channels.Channels.newChannel(buf)
        val w = compressEvenZstd match {
          case None =>
            new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null, ch)
          case Some(zstd) =>
            import org.apache.arrow.vector.compression.CompressionUtil
            new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null,
              ch, null,
              org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
              org.apache.arrow.compression.CommonsCompressionFactory
                .INSTANCE,
              if (zstd) CompressionUtil.CodecType.ZSTD
              else CompressionUtil.CodecType.LZ4_FRAME)
        }
        w.start(); w.writeBatch(); w.end(); w.close()
        buf.toByteArray
      } finally root.close()
    } finally alloc.close()
  }
  /** Nested Arrow IPC decode (r12) — the shapes HuggingFace-datasets
    * shards actually carry: a `list<int64>` token column (nullable at
    * BOTH levels) and a `struct<n_chars,lang>` metadata column. The
    * write side is arrow-java ListVector/StructVector; the read side
    * is OUR recursive flatbuffer walker (operators/ArrowIpc), so list
    * offsets, child validity bitmaps and struct child ordering must
    * all be value-transparent. Every fact below is re-derived from
    * DECODED nested values. Same shuffle shape as arrow_ipc_parse. */
  private[graft] def arrowIpcNested(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    arrowNestedShards(s, dir)
      .flatMap { case (sid, bytes) =>
        val (cols, rows) = graft.operators.ArrowIpc.parseFile(bytes)
          .getOrElse(sys.error(s"arrow nested parse rejected shard $sid"))
        require(cols.map(_.tag) == Seq("int64", "list", "struct") &&
          cols(1).children.map(_.tag) == Seq("int64") &&
          cols(2).children.map(_.tag) == Seq("int64", "utf8"))
        rows.map { r =>
          val id = r(0).get.asInstanceOf[Long]
          val toks = r(1).map(_.asInstanceOf[Seq[Option[Any]]])
          val st = r(2).get.asInstanceOf[Seq[Option[Any]]]
          (id, sid,
            toks.map(_.length.toLong),
            toks.map(_.flatten.map(_.asInstanceOf[Long]).sum),
            toks.map(ts => ts.count(_.isEmpty).toLong),
            st(1).map(_.asInstanceOf[String]),
            st(0).get.asInstanceOf[Long])
        }
      }
      .toDF("doc_id", "shard_id", "n_tokens", "token_sum", "null_tokens",
        "lang", "meta_len")
      .orderBy("doc_id")
  }
  /** Arrow MAP + DECIMAL128 decode (r12): arrow-java writes
    * map<utf8,int64> word-length histograms and a decimal(20,4)
    * column; OUR reader decodes entries (offsets + entry struct,
    * key non-nullness checked against the WIRE bitmaps) and
    * 16-byte two's-complement decimals. Every fact — entry counts,
    * non-null value sums, null-value counts, max key, the decimal's
    * exact plain string — comes from DECODED values. */
  private[graft] def arrowIpcMap(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    arrowMapShards(s, dir)
      .flatMap { case (sid, bytes) =>
        val (cols, rows) = graft.operators.ArrowIpc.parseFile(bytes)
          .getOrElse(sys.error(s"arrow map parse rejected shard $sid"))
        require(cols.map(_.tag) == Seq("int64", "map", "decimal128_20_4"))
        require(cols(1).children.head.children.map(_.tag) ==
          Seq("utf8", "int64"))
        rows.map { r =>
          val id = r(0).get.asInstanceOf[Long]
          val m = r(1).map(_.asInstanceOf[Seq[Option[Any]]].map { e =>
            val kv = e.get.asInstanceOf[Seq[Option[Any]]]
            (kv(0).get.asInstanceOf[String],
              kv(1).map(_.asInstanceOf[Long]))
          })
          val price = r(2)
            .map(_.asInstanceOf[java.math.BigDecimal].toPlainString)
          (id, sid,
            m.map(_.length.toLong),
            m.map(_.flatMap(_._2).sum),
            m.map(_.count(_._2.isEmpty).toLong),
            m.flatMap(_.map(_._1.toLong).maxOption),
            price)
        }
      }
      .toDF("doc_id", "shard_id", "m_size", "v_sum", "n_nullv",
        "k_max", "price_s")
      .orderBy("doc_id")
  }
  /** UNION-column Arrow IPC decode (late r14): arrow-java's
    * UnionVector (sparse, even shards) and DenseUnionVector (dense,
    * odd shards) write an i64/f64 union with nulls in the int
    * branch; OUR reader resolves each slot through the type-id
    * table (dense offsets bounds-checked) and the gate surfaces the
    * value by its RUNTIME branch — the oracle re-derives both
    * branches analytically, so a type-id, offset or child-null slip
    * flips the hash. */
  private[graft] def arrowIpcUnion(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, _) => (id / 8, id) }
      .groupByKey(_._1)
      .mapGroups { (sid: Long, it: Iterator[(Long, Long)]) =>
        val ids = it.map(_._2).toSeq.sorted
        (sid, buildArrowUnionShard(ids, dense = sid % 2 == 1))
      }
      .flatMap { case (sid, bytes) =>
        val (cols, rows) = graft.operators.ArrowIpc.parseFile(bytes)
          .getOrElse(sys.error(s"arrow union parse rejected $sid"))
        require(cols(1).tag ==
          (if (sid % 2 == 1) "union_dense" else "union_sparse"),
          s"union mode drift in shard $sid")
        rows.map { r =>
          val id = r(0).get.asInstanceOf[Long]
          val (ui, uf) = r(1) match {
            case Some(l: Long) => (Some(l), None)
            case Some(d: Double) => (None, Some(d))
            case None => (None, None)
            case other => sys.error(s"unexpected union value $other")
          }
          (id, sid, ui, uf)
        }
      }
      .toDF("doc_id", "shard_id", "u_i", "u_f")
      .orderBy("doc_id")
  }
  /** One 8-doc Arrow file with an i64/f64 union column: float
    * branch when id % 4 == 1 (id * 0.25), else int branch (null
    * when id % 5 == 2, else id * 7). */
  private[graft] def buildArrowUnionShard(ids: Seq[Long],
      dense: Boolean): Array[Byte] = {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.complex.{DenseUnionVector,
      UnionVector}
    import org.apache.arrow.vector.holders.{NullableBigIntHolder,
      NullableFloat8Holder}
    import org.apache.arrow.vector.types.Types.MinorType
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field,
      FieldType}
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val n = ids.length
      val idv = new BigIntVector("id", alloc)
      idv.allocateNew()
      ids.zipWithIndex.foreach { case (id, i) => idv.setSafe(i, id) }
      idv.setValueCount(n)
      val hI = new NullableBigIntHolder
      val hF = new NullableFloat8Holder
      val uv: FieldVector =
        if (!dense) {
          val v = UnionVector.empty("u", alloc)
          v.allocateNew()
          ids.zipWithIndex.foreach { case (id, i) =>
            if (id % 4 == 1) {
              hF.isSet = 1; hF.value = id * 0.25
              v.setType(i, MinorType.FLOAT8); v.setSafe(i, hF)
            } else {
              hI.isSet = if (id % 5 == 2) 0 else 1
              hI.value = id * 7
              v.setType(i, MinorType.BIGINT); v.setSafe(i, hI)
            }
          }
          v.setValueCount(n)
          v
        } else {
          val v = DenseUnionVector.empty("u", alloc)
          val tidI = v.registerNewTypeId(new Field("i64",
            FieldType.nullable(new ArrowType.Int(64, true)), null))
          val tidF = v.registerNewTypeId(new Field("f64",
            FieldType.nullable(new ArrowType.FloatingPoint(
              org.apache.arrow.vector.types.FloatingPointPrecision
                .DOUBLE)), null))
          v.allocateNew()
          ids.zipWithIndex.foreach { case (id, i) =>
            if (id % 4 == 1) {
              hF.isSet = 1; hF.value = id * 0.25
              v.setTypeId(i, tidF); v.setSafe(i, hF)
            } else {
              hI.isSet = if (id % 5 == 2) 0 else 1
              hI.value = id * 7
              v.setTypeId(i, tidI); v.setSafe(i, hI)
            }
          }
          v.setValueCount(n)
          v
        }
      try {
        val root = new VectorSchemaRoot(
          java.util.Arrays.asList(idv.getField, uv.getField),
          java.util.Arrays.asList[FieldVector](idv, uv), n)
        val buf = new java.io.ByteArrayOutputStream()
        val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root,
          new org.apache.arrow.vector.dictionary.DictionaryProvider
            .MapDictionaryProvider(),
          java.nio.channels.Channels.newChannel(buf))
        w.start(); w.writeBatch(); w.end(); w.close()
        buf.toByteArray
      } finally { idv.close(); uv.close() }
    } finally alloc.close()
  }
  /** Dictionary-encoded Arrow IPC decode (r12) — how dataset shards
    * store low-cardinality string columns: arrow-java's
    * DictionaryEncoder writes a DictionaryBatch plus int32 index
    * columns, OUR reader decodes the value batch and resolves the
    * indices (bounds-checked) through it. Facts from RESOLVED values
    * only. Same shard shuffle + flatMap shape as arrow_ipc_parse. */
  private[graft] def arrowIpcDict(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) => (id / 8, id, t.length.toLong) }
      .groupByKey(_._1)
      .mapGroups { (sid: Long, it: Iterator[(Long, Long, Long)]) =>
        val docs = it.toSeq.sortBy(_._2)
        (sid, buildArrowDictShard(docs.map { case (_, id, n) => (id, n) }))
      }
      .flatMap { case (sid, bytes) =>
        val (cols, rows) = graft.operators.ArrowIpc.parseFile(bytes)
          .getOrElse(sys.error(s"arrow dict parse rejected shard $sid"))
        require(cols.map(_.tag) == Seq("int64", "utf8") &&
          cols(1).dict.isDefined, "expected a dictionary-encoded label")
        rows.map { r =>
          (r(0).get.asInstanceOf[Long], sid,
            r(1).map(_.asInstanceOf[String]))
        }
      }
      .toDF("doc_id", "shard_id", "label")
      .orderBy("doc_id")
  }
  /** One 8-doc Arrow file with a dictionary-encoded label column:
    * 4 shared label values, indices int32, label null every 11th doc
    * (the arrow_ipc_parse rule — but resolved through a
    * DictionaryBatch this time). */
  private[graft] def buildArrowDictShard(docs: Seq[(Long, Long)]): Array[Byte] = {
    import org.apache.arrow.vector.types.pojo.{ArrowType,
      DictionaryEncoding, Field, FieldType}
    import org.apache.arrow.vector.dictionary.{Dictionary,
      DictionaryEncoder, DictionaryProvider}
    import org.apache.arrow.vector._
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val dictVec = new VarCharVector("dictv", alloc)
      val raw = new VarCharVector(new Field("label",
        new FieldType(true, ArrowType.Utf8.INSTANCE, null), null), alloc)
      val ids = new BigIntVector("id", alloc)
      try {
        dictVec.allocateNew()
        (0 until 4).foreach(i =>
          dictVec.setSafe(i, s"label$i".getBytes("UTF-8")))
        dictVec.setValueCount(4)
        val enc = new DictionaryEncoding(1L, false,
          new ArrowType.Int(32, true))
        val dictionary = new Dictionary(dictVec, enc)
        val provider =
          new DictionaryProvider.MapDictionaryProvider(dictionary)
        raw.allocateNew()
        ids.allocateNew()
        docs.zipWithIndex.foreach { case ((id, _), i) =>
          ids.setSafe(i, id)
          if (id % 11 == 10) raw.setNull(i)
          else raw.setSafe(i, s"label${id % 4}".getBytes("UTF-8"))
        }
        raw.setValueCount(docs.length)
        ids.setValueCount(docs.length)
        val encoded = DictionaryEncoder.encode(raw, dictionary)
          .asInstanceOf[IntVector]
        try {
          val root = new VectorSchemaRoot(
            java.util.Arrays.asList(ids.getField, encoded.getField),
            java.util.Arrays.asList[FieldVector](ids, encoded),
            docs.length)
          val buf = new java.io.ByteArrayOutputStream()
          val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root,
            provider, java.nio.channels.Channels.newChannel(buf))
          w.start(); w.writeBatch(); w.end(); w.close()
          buf.toByteArray
        } finally encoded.close()
      } finally { raw.close(); ids.close(); dictVec.close() }
    } finally alloc.close()
  }
  /** Embedding-shard Arrow decode (r12) — the EXACT shape vector
    * datasets ship in: `fixed_size_list<float32, 64>` embedding
    * columns (null every 13th vec) beside a LargeUtf8 label, built
    * by arrow-java FixedSizeListVector/LargeVarCharVector over the
    * REAL embeddings table, decoded by OUR reader. The quantized
    * per-vector sum (the repo's round(x·1000) convention) makes
    * every float32 lane value-transparent. */
  private[graft] def arrowIpcEmbeddings(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    Tables.embeddings(s, dir)
      .selectExpr("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)]
      .map { case (id, emb, label) => (id / 8, id, emb, label) }
      .groupByKey(_._1)
      .mapGroups { (sid: Long,
          it: Iterator[(Long, Long, Array[Float], Int)]) =>
        val vecs = it.toSeq.sortBy(_._2)
        (sid, buildArrowEmbShard(vecs.map {
          case (_, id, e, l) => (id, e, l) }))
      }
      .flatMap { case (sid, bytes) =>
        val (cols, rows) = graft.operators.ArrowIpc.parseFile(bytes)
          .getOrElse(sys.error(s"arrow emb parse rejected shard $sid"))
        require(cols.map(_.tag) ==
          Seq("int64", "fixed_list", "large_utf8") &&
          cols(1).fixedSize == 64 &&
          cols(1).children.head.tag == "float32")
        rows.map { r =>
          val id = r(0).get.asInstanceOf[Long]
          val emb = r(1).map(_.asInstanceOf[Seq[Option[Any]]])
          (id, sid,
            emb.map(_.length),
            emb.map(_.map(v => math.round(
              v.get.asInstanceOf[Float].toDouble * 1000)).sum),
            r(2).map(_.asInstanceOf[String]))
        }
      }
      .toDF("vec_id", "shard_id", "dim", "emb_q", "label")
      .orderBy("vec_id")
  }
  /** One 8-vector Arrow file: fixed_size_list<float32,64> + LargeUtf8. */
  private[graft] def buildArrowEmbShard(
      vecs: Seq[(Long, Array[Float], Int)]): Array[Byte] = {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field,
      FieldType, Schema => ASchema}
    import org.apache.arrow.vector.types.FloatingPointPrecision
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.complex.FixedSizeListVector
    import scala.jdk.CollectionConverters._
    val schema = new ASchema(Seq(
      new Field("vec_id", new FieldType(false,
        new ArrowType.Int(64, true), null), null),
      new Field("emb", new FieldType(true,
        new ArrowType.FixedSizeList(64), null),
        Seq(new Field("item", new FieldType(false,
          new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE),
          null), null)).asJava),
      new Field("label", new FieldType(true,
        ArrowType.LargeUtf8.INSTANCE, null), null)).asJava)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val root = VectorSchemaRoot.create(schema, alloc)
      try {
        root.allocateNew()
        val ids = root.getVector("vec_id").asInstanceOf[BigIntVector]
        val emb = root.getVector("emb").asInstanceOf[FixedSizeListVector]
        val embData = emb.getDataVector.asInstanceOf[Float4Vector]
        val lab = root.getVector("label")
          .asInstanceOf[LargeVarCharVector]
        vecs.zipWithIndex.foreach { case ((id, e, l), i) =>
          require(e.length == 64, s"vec $id dim ${e.length}")
          ids.setSafe(i, id)
          if (id % 13 == 9) emb.setNull(i)
          else {
            emb.setNotNull(i)
            var j = 0
            while (j < 64) { embData.setSafe(i * 64 + j, e(j)); j += 1 }
          }
          if (id % 11 == 10) lab.setNull(i)
          else lab.setSafe(i, s"cls-$l".getBytes("UTF-8"))
        }
        root.setRowCount(vecs.length)
        val buf = new java.io.ByteArrayOutputStream()
        val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root,
          null, java.nio.channels.Channels.newChannel(buf))
        w.start(); w.writeBatch(); w.end(); w.close()
        buf.toByteArray
      } finally root.close()
    } finally alloc.close()
  }
  /** Embedding-shard safetensors decode (r12) — the OTHER shape
    * vector dumps ship in: a `.safetensors` file per shard with an
    * F32 [n,64] `emb` matrix, an I64 [n] `vec_id` vector and an
    * I32 [n] `label` vector beside a string metadata map, built by
    * OUR encoder over the REAL embeddings table and read back by
    * OUR parser (operators/Safetensors — 8-byte LE header length,
    * JSON tensor directory, flat LE buffer). The quantized
    * per-vector sum makes every F32 lane value-transparent; shard
    * membership and metadata round-trip are asserted in-flight.
    * Pure map pass; no shuffle beyond the 8-vector grouping and the
    * presentation sort. */
  private[graft] def safetensorsParse(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Safetensors._
    Tables.embeddings(s, dir)
      .selectExpr("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)]
      .map { case (id, emb, label) => (id / 8, id, emb, label) }
      .groupByKey(_._1)
      .mapGroups { (sid: Long,
          it: Iterator[(Long, Long, Array[Float], Int)]) =>
        val vecs = it.toSeq.sortBy(_._2)
        val n = vecs.length
        val dim = vecs.head._3.length
        val embBuf = java.nio.ByteBuffer.allocate(n * dim * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val idBuf = java.nio.ByteBuffer.allocate(n * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val labBuf = java.nio.ByteBuffer.allocate(n * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        vecs.foreach { case (_, id, e, l) =>
          e.foreach(embBuf.putFloat)
          idBuf.putLong(id); labBuf.putInt(l)
        }
        (sid, build(Seq(
          Tensor("emb", "F32", Seq(n.toLong, dim.toLong),
            embBuf.array()),
          Tensor("vec_id", "I64", Seq(n.toLong), idBuf.array()),
          Tensor("label", "I32", Seq(n.toLong), labBuf.array())),
          Map("format" -> "graft-emb", "shard" -> sid.toString)))
      }
      .flatMap { case (sid, bytes) =>
        val (md, ts) = parse(bytes).getOrElse(
          sys.error(s"safetensors rejected shard $sid"))
        require(md("format") == "graft-emb" &&
          md("shard") == sid.toString)
        val byName = ts.map(t => t.name -> t).toMap
        val emb = byName("emb"); val ids = byName("vec_id")
        val lab = byName("label")
        require(emb.dtype == "F32" && ids.dtype == "I64" &&
          lab.dtype == "I32" && emb.shape.length == 2)
        val n = emb.shape.head.toInt
        val dim = emb.shape(1).toInt
        (0 until n).map { i =>
          var q = 0L
          var j = 0
          while (j < dim) {
            q += math.round(f32At(emb, i * dim + j).toDouble * 1000)
            j += 1
          }
          (i64At(ids, i), sid, dim, q, i32At(lab, i))
        }
      }
      .toDF("vec_id", "shard_id", "dim", "emb_q", "label")
      .orderBy("vec_id")
  }
  /** Structured `.npy` record arrays (late r12, operators/Npy):
    * per 16-doc chunk one PACKED recarray with fields across every
    * kind the parser supports — i8, u4 (unsigned read-back
    * pinned), f8, S (latin-1 bytes), U (UCS-4 text), PLUS a
    * sub-array field (`u4[3]`, C-ordered lanes inside the record)
    * and a NESTED record group (`rng{lo i4, hi i4}`, flattened to
    * dot names) — built by OUR writer, parsed by
    * [[Npy.parseStructured]], every fact from DECODED field lanes.
    * A wrong field offset, width, sub-array stride or string strip
    * flips values; the oracle recomputes from documents. */
  private[graft] def npyStructured(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Npy
    asciiDocs(s, dir)
      .map { case (id, t) => (id / 16, id, t) }
      .groupByKey(_._1)
      .mapGroups { (cid: Long, it: Iterator[(Long, Long, String)]) =>
        val docs = it.toSeq.sortBy(_._2)
        val spec = Seq(
          Npy.FLeaf("doc_id", "<i8"), Npy.FLeaf("text_len", "<u4"),
          Npy.FLeaf("score", "<f8"), Npy.FLeaf("tag", "|S6"),
          Npy.FLeaf("mark", "<U4"),
          Npy.FLeaf("tl3", "<u4", Seq(3)),
          Npy.FGroup("rng", Seq(Npy.FLeaf("lo", "<i4"),
            Npy.FLeaf("hi", "<i4"))))
        val itemSize = 8 + 4 + 8 + 6 + 16 + 12 + 8
        val buf = java.nio.ByteBuffer
          .allocate(docs.length * itemSize)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        docs.foreach { case (_, id, t) =>
          buf.putLong(id)
          buf.putInt(t.length)
          buf.putDouble(t.length * 0.25)
          val tag = s"t${id % 100}".getBytes("ISO-8859-1")
          buf.put(tag)
          (tag.length until 6).foreach(_ => buf.put(0.toByte))
          val mark = s"m${id % 7}"
          mark.foreach(c => buf.putInt(c.toInt))
          (mark.length until 4).foreach(_ => buf.putInt(0))
          // tl3: the u4[3] sub-array lanes
          buf.putInt(t.length)
          buf.putInt(t.length * 2)
          buf.putInt(t.length % 7)
          // rng: the nested group
          buf.putInt((id % 11).toInt)
          buf.putInt((id % 13).toInt)
        }
        (cid, Npy.buildStructuredTree(spec, Seq(docs.length),
          buf.array()))
      }
      .flatMap { case (cid, npy) =>
        val rec = Npy.parseStructured(npy).getOrElse(
          sys.error(s"structured npy rejected chunk $cid"))
        require(rec.fields.map(_.name) ==
          Seq("doc_id", "text_len", "score", "tag", "mark",
            "tl3", "rng.lo", "rng.hi"))
        val f = rec.fields.map(x => x.name -> x).toMap
        require(f("tl3").count == 3 && f("tl3").subShape == Seq(3))
        (0 until rec.elems).map { i =>
          (rec.longAt(f("doc_id"), i),
            rec.longAt(f("text_len"), i),
            rec.doubleAt(f("score"), i),
            rec.stringAt(f("tag"), i),
            rec.stringAt(f("mark"), i),
            rec.longAt(f("tl3"), i, 1),
            rec.longAt(f("tl3"), i, 2),
            rec.longAt(f("rng.lo"), i),
            rec.longAt(f("rng.hi"), i))
        }
      }
      .toDF("doc_id", "text_len", "score", "tag", "mark",
        "len2", "len_mod7", "rng_lo", "rng_hi")
      .orderBy("doc_id")
  }
  /** NumPy `.npy` decode (r12) across ALL FOUR layout combos — the
    * raw array dumps scientific pipelines hand over: per 8-vector
    * shard one f4 matrix [n, 65] (col 0 = vec_id, cols 1..64 = the
    * embedding), with memory order and byte order rotating by shard
    * id (C/LE, C/BE, Fortran/LE, Fortran/BE) so the index mapping
    * and both endians are all value-transparent in one gate. The
    * `fortran`/`big_endian` columns surface from the PARSED header,
    * oracle-predicted from the shard id. */
  private[graft] def npyParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Npy
    Tables.embeddings(s, dir)
      .selectExpr("vec_id", "embedding")
      .as[(Long, Array[Float])]
      .map { case (id, emb) => (id / 8, id, emb) }
      .groupByKey(_._1)
      .mapGroups { (sid: Long,
          it: Iterator[(Long, Long, Array[Float])]) =>
        val vecs = it.toSeq.sortBy(_._2)
        val n = vecs.length
        val dim = vecs.head._3.length
        val cols = dim + 1
        val fortran = sid % 4 >= 2
        val big = sid % 2 == 1
        def cell(r: Int, c: Int): Float =
          if (c == 0) vecs(r)._2.toFloat else vecs(r)._3(c - 1)
        val buf = java.nio.ByteBuffer.allocate(n * cols * 4)
          .order(if (big) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
        if (fortran) // column-major: first axis varies fastest
          (0 until cols).foreach(c => (0 until n).foreach(r =>
            buf.putFloat(cell(r, c))))
        else
          (0 until n).foreach(r => (0 until cols).foreach(c =>
            buf.putFloat(cell(r, c))))
        (sid, Npy.build("f4", Seq(n, cols), buf.array(),
          fortran = fortran, bigEndian = big))
      }
      .flatMap { case (sid, bytes) =>
        val a = Npy.parse(bytes).getOrElse(
          sys.error(s"npy rejected shard $sid"))
        require(a.descr == "f4" && a.shape.length == 2)
        val n = a.shape.head
        val dim = a.shape(1) - 1
        (0 until n).map { i =>
          var q = 0L
          var j = 1
          while (j <= dim) {
            q += math.round(a.at(i, j) * 1000); j += 1
          }
          (a.at(i, 0).toLong, sid, dim, q, a.fortran, a.bigEndian)
        }
      }
      .toDF("vec_id", "shard_id", "dim", "emb_q", "fortran",
        "big_endian")
      .orderBy("vec_id")
  }
  /** NumPy `.npz` decode (r12) — `np.savez`'s ZIP-of-`.npy` layout
    * over the REAL embeddings table: per shard `emb.npy` f4 [n,64],
    * `vec_id.npy` i8 [n] and `label.npy` i4 [n], STORED on even
    * shards and DEFLATE (`savez_compressed`) on odd ones, walked by
    * the verified [[graft.operators.Zip]] central directory and the
    * `.npy` parser. Every fact from DECODED values. */
  private[graft] def npzParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Npy
    Tables.embeddings(s, dir)
      .selectExpr("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)]
      .map { case (id, emb, label) => (id / 8, id, emb, label) }
      .groupByKey(_._1)
      .mapGroups { (sid: Long,
          it: Iterator[(Long, Long, Array[Float], Int)]) =>
        val vecs = it.toSeq.sortBy(_._2)
        val n = vecs.length
        val dim = vecs.head._3.length
        val emb = Npy.buildF4(Seq(n, dim),
          vecs.flatMap(_._3).toArray)
        val ids = Npy.buildI8(Seq(n), vecs.map(_._2).toArray)
        val labBuf = java.nio.ByteBuffer.allocate(n * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        vecs.foreach(v => labBuf.putInt(v._4))
        val lab = Npy.build("i4", Seq(n), labBuf.array())
        (sid, Npy.buildNpz(
          Seq("emb" -> emb, "vec_id" -> ids, "label" -> lab),
          deflate = sid % 2 == 1))
      }
      .flatMap { case (sid, bytes) =>
        val m = Npy.parseNpz(bytes).getOrElse(
          sys.error(s"npz rejected shard $sid")).toMap
        val emb = m("emb"); val ids = m("vec_id")
        val lab = m("label")
        require(emb.descr == "f4" && ids.descr == "i8" &&
          lab.descr == "i4" && emb.shape.length == 2)
        val n = emb.shape.head
        val dim = emb.shape(1)
        (0 until n).map { i =>
          var q = 0L
          var j = 0
          while (j < dim) {
            q += math.round(emb.at(i, j) * 1000); j += 1
          }
          (ids.longAt(i), sid, dim, q, lab.at(i).toInt)
        }
      }
      .toDF("vec_id", "shard_id", "dim", "emb_q", "label")
      .orderBy("vec_id")
  }
  /** GGUF shard decode (r12) — the llama.cpp single-file container
    * (operators/Gguf): per 8-vector shard one GGUF v3 file holding
    * an F32 `emb` tensor in GGML dim order (ne[0] = innermost =
    * dim), an I64 `vec_id` tensor, a Q8_0-quantized twin of the
    * embedding matrix PLUS a second twin in one of the other four
    * 32-block quants rotated by shard id (Q4_0, Q4_1, Q5_0, Q5_1),
    * PLUS — on shards whose n·dim tiles 256-element super-blocks —
    * a K-QUANT twin rotated Q2_K…Q6_K by shard id (held in-flight
    * to the analytic per-group bounds of
    * [[graft.operators.Gguf.checkKQuantBounds]]; its tag surfaces
    * as `qktag`), and metadata
    * (architecture string, shard id i64, a per-shard label i32
    * array — the tokenizer-vocab shape). OUR writer builds it, OUR
    * parser reads it back; F32 lanes, the metadata label array and
    * the rotated quant tag surface to the oracle, and both quant
    * twins are held to their closed-form error bounds in-flight
    * (Q8_0: |deq − x| ≤ d/2; 4/5-bit: ≤ |d| for the symmetric
    * forms whose clamp can cost one level, ≤ 0.52·d + f16(m) slop
    * for the affine forms — a wrong scale, offset plane or block
    * walk fails the run, no oracle needed). */
  private[graft] def ggufParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Gguf._
    Tables.embeddings(s, dir)
      .selectExpr("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)]
      .map { case (id, emb, label) => (id / 8, id, emb, label) }
      .groupByKey(_._1)
      .mapGroups { (sid: Long,
          it: Iterator[(Long, Long, Array[Float], Int)]) =>
        val vecs = it.toSeq.sortBy(_._2)
        val n = vecs.length
        val dim = vecs.head._3.length
        val flat = vecs.flatMap(_._3).toArray
        val embBuf = java.nio.ByteBuffer.allocate(n * dim * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        flat.foreach(embBuf.putFloat)
        val idBuf = java.nio.ByteBuffer.allocate(n * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        vecs.foreach(v => idBuf.putLong(v._2))
        val qtag = Seq("Q4_0", "Q4_1", "Q5_0", "Q5_1")(
          (sid % 4).toInt)
        val qdata = qtag match {
          case "Q4_0" => quantizeQ4_0(flat)
          case "Q4_1" => quantizeQ4_1(flat)
          case "Q5_0" => quantizeQ5_0(flat)
          case _ => quantizeQ5_1(flat)
        }
        // the K-quant twin needs 256-element super-blocks — a
        // partial tail shard whose n·dim isn't a multiple of 256
        // carries none (and says so in qktag)
        val kTensor =
          if (flat.length % 256 == 0) {
            val ktag = Seq("Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K")(
              (sid % 5).toInt)
            val kdata = ktag match {
              case "Q2_K" => quantizeQ2_K(flat)
              case "Q3_K" => quantizeQ3_K(flat)
              case "Q4_K" => quantizeQ4_K(flat)
              case "Q5_K" => quantizeQ5_K(flat)
              case _ => quantizeQ6_K(flat)
            }
            Seq(GTensor("emb_qk", Seq(dim.toLong, n.toLong), ktag,
              kdata))
          } else Seq.empty
        (sid, build(
          Seq(
            "general.architecture" -> GvStr("graft"),
            "shard.id" -> GvI64(sid),
            "shard.labels" -> GvArr(5,
              vecs.map(v => GvI32(v._4)))),
          Seq(
            GTensor("emb", Seq(dim.toLong, n.toLong), "F32",
              embBuf.array()),
            GTensor("vec_id", Seq(n.toLong), "I64", idBuf.array()),
            GTensor("emb_q8", Seq(dim.toLong, n.toLong), "Q8_0",
              quantizeQ8_0(flat)),
            GTensor("emb_qx", Seq(dim.toLong, n.toLong), qtag,
              qdata)) ++ kTensor))
      }
      .flatMap { case (sid, bytes) =>
        val (kvs, ts) = parse(bytes).getOrElse(
          sys.error(s"gguf rejected shard $sid"))
        val md = kvs.toMap
        require(md("general.architecture") == GvStr("graft") &&
          md("shard.id") == GvI64(sid))
        val GvArr(5, labels) = md("shard.labels"): @unchecked
        val byName = ts.map(t => t.name -> t).toMap
        val emb = byName("emb"); val ids = byName("vec_id")
        val q8 = byName("emb_q8"); val qx = byName("emb_qx")
        require(emb.tpe == "F32" && q8.tpe == "Q8_0" &&
          emb.dims == q8.dims && emb.dims == qx.dims &&
          emb.dims.length == 2)
        val dim = emb.dims.head.toInt // ne[0] = innermost
        val n = emb.dims(1).toInt
        // the K-quant twin (shards whose n·dim tiles 256-element
        // super-blocks): dequantize and hold every lane to the
        // analytic per-group bound — a wrong scale index, bit
        // plane or byte walk fails the run, no oracle needed
        val qktag = byName.get("emb_qk") match {
          case Some(qk) =>
            require(qk.dims == emb.dims, "emb_qk dims drifted")
            val flatBack = new Array[Float](n * dim)
            var fi = 0
            while (fi < flatBack.length) {
              flatBack(fi) = f32At(emb, fi); fi += 1
            }
            checkKQuantBounds(qk.tpe, flatBack, qk.data)
            qk.tpe
          case None =>
            require((n * dim) % 256 != 0,
              s"shard $sid should carry a K-quant twin")
            "none"
        }
        val deq = dequantizeQ8_0(q8.data)
        // the rotated 4/5-bit twin: dequantize and hold every lane
        // to its closed-form bound (symmetric forms pay up to one
        // level at the clamped extreme; affine forms pay half a
        // level plus the f16 rounding of the stored min)
        val qtag = qx.tpe
        val deqX = qtag match {
          case "Q4_0" => dequantizeQ4_0(qx.data)
          case "Q4_1" => dequantizeQ4_1(qx.data)
          case "Q5_0" => dequantizeQ5_0(qx.data)
          case "Q5_1" => dequantizeQ5_1(qx.data)
          case t => sys.error(s"unexpected quant tag $t")
        }
        val blockBytes = Map("Q4_0" -> 18, "Q4_1" -> 20,
          "Q5_0" -> 22, "Q5_1" -> 24)(qtag)
        var blk = 0
        while (blk * 32 < n * dim) {
          val base = blk * 32
          var mn = f32At(emb, base); var mx = mn
          var k = 1
          while (k < 32) {
            val v = f32At(emb, base + k)
            if (v < mn) mn = v; if (v > mx) mx = v
            k += 1
          }
          val bb = java.nio.ByteBuffer.wrap(qx.data,
            blk * blockBytes, blockBytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val d = math.abs(graft.operators.Safetensors.halfToFloat(
            bb.getShort() & 0xffff))
          val affine = qtag == "Q4_1" || qtag == "Q5_1"
          val bound =
            if (affine)
              d * 0.52 +
                math.max(math.abs(mn), math.abs(mx)) * 1e-3 + 1e-6
            else d * 1.01 + 1e-7
          k = 0
          while (k < 32) {
            val x = f32At(emb, base + k)
            require(math.abs(deqX(base + k) - x) <= bound,
              s"$qtag bound broken at block $blk lane $k: " +
                s"$x -> ${deqX(base + k)} (d=$d)")
            k += 1
          }
          blk += 1
        }
        (0 until n).map { i =>
          var q = 0L
          var j = 0
          while (j < dim) {
            val x = f32At(emb, i * dim + j)
            q += math.round(x.toDouble * 1000)
            // Q8_0 twin: closed-form error bound per 32-lane block
            val blockBase = (i * dim + j) / 32 * 32
            var amax = 0f
            var k = 0
            while (k < 32) {
              val a = math.abs(f32At(emb, blockBase + k))
              if (a > amax) amax = a
              k += 1
            }
            val d = graft.operators.Safetensors.halfToFloat(
              graft.operators.Safetensors.floatToHalf(amax / 127f)
                & 0xffff)
            require(math.abs(deq(i * dim + j) - x) <=
              d * 0.51 + 1e-7, s"Q8_0 bound broken at $i/$j")
            j += 1
          }
          val GvI32(label) = labels(i): @unchecked
          (i64At(ids, i), sid, dim, q, label, "graft", qtag, qktag)
        }
      }
      .toDF("vec_id", "shard_id", "dim", "emb_q", "label", "arch",
        "qtag", "qktag")
      .orderBy("vec_id")
  }
  /** The user-facing tensor-shard DataFrame API under the oracle
    * (r12): [[graft.sources.TensorSink]] writes the REAL embeddings
    * table as a `.safetensors` shard tree (one file per partition —
    * vec_id I64, embedding F32 [n,64], label I32), then
    * [[graft.sources.TensorSource]] reads the tree back as a typed
    * DataFrame and the facts are derived with PLAIN SQL over it —
    * the whole write-read stack must be value-transparent. Shard
    * membership is partitioning-dependent and deliberately absent
    * from the result. */
  private[graft] def tensorSourceRead(s: SparkSession, dir: String)
      : DataFrame = {
    val root = formatFixtureDir(dir, "safetensors", "embeddings") {
      out =>
        graft.sources.TensorSink.write(
          Tables.embeddings(s, dir)
            .selectExpr("vec_id", "embedding", "label")
            .repartition(8, col("vec_id")),
          out, Map("format" -> "graft-emb"))
    }
    graft.sources.TensorSource.read(s, root)
      .selectExpr(
        "vec_id",
        "CAST(size(embedding) AS INT) AS dim",
        "aggregate(transform(embedding, " +
          "x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)), " +
          "0L, (a, x) -> a + x) AS emb_q",
        "label")
      .orderBy("vec_id")
  }
  /** Zarr v2 store read (r12) — the chunked-array DIRECTORY format
    * (operators/Zarr): the fixture writes the REAL embeddings table
    * as a three-array store with the knobs deliberately rotated —
    * `emb` f4 [N,64] in FORTRAN chunk order under BLOSC with inner
    * lz4 + byte-shuffle + split streams (zarr's real-world DEFAULT
    * compressor, late-r12), `ids` i8 [N,1] under zlib BEHIND a
    * numcodecs delta→shuffle FILTER CHAIN (late r12 — monotone ids
    * are the textbook delta case; a wrong filter order or width
    * scrambles every id), `labels` i4 [N,1] BIG-ENDIAN under the
    * numcodecs lz4 framing — with chunk rows of 7 so an edge chunk
    * (fill-padded, never surfaced) exists at every sf. The query reads each grid through
    * binaryFile + per-chunk decode (zarr's native layout IS a
    * distributed scan: one independent decode per chunk file, no
    * shuffle until the final index join) and reassembles per-vector
    * facts under the same oracle as the safetensors source. */
  private[graft] def zarrRead(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Zarr
    val root = formatFixtureDir(dir, "zarrc", "embeddings") { out =>
      val rows = Tables.embeddings(s, dir)
        .selectExpr("vec_id", "embedding", "label")
        .as[(Long, Array[Float], Int)].collect().sortBy(_._1)
      val n = rows.length.toLong
      def putIn(sub: String)(name: String, bytes: Array[Byte]) = {
        val d = new java.io.File(out, sub)
        d.mkdirs()
        java.nio.file.Files.write(
          new java.io.File(d, name).toPath, bytes): Unit
      }
      Zarr.write2d(
        Zarr.Meta(Seq(n, 64L), Seq(7, 64), "f4", bigEndian = false,
          fortran = true, Some("blosc"), 5, 0.0, ".",
          bloscCname = "lz4", bloscShuffle = 1),
        n, 64, (r, c) => rows(r.toInt)._2(c).toDouble,
        putIn("emb"))
      Zarr.write2d(
        Zarr.Meta(Seq(n, 1L), Seq(7, 1), "i8", bigEndian = false,
          fortran = false, Some("zlib"), 5, -1.0, ".",
          filters = Seq(("delta", 0), ("shuffle", 8))),
        n, 1, (r, _) => rows(r.toInt)._1.toDouble,
        putIn("ids"))
      Zarr.write2d(
        Zarr.Meta(Seq(n, 1L), Seq(7, 1), "i4", bigEndian = true,
          fortran = false, Some("lz4"), 1, -1.0, "."),
        n, 1, (r, _) => rows(r.toInt)._3.toDouble,
        putIn("labels"))
    }
    def grid(sub: String, factName: String)(
        fact: (graft.operators.Npy.Arr, Int) => Long): DataFrame = {
      val metaJson = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$root/$sub/.zarray")), "UTF-8")
      val meta = Zarr.parseMeta(metaJson).getOrElse(
        sys.error(s"bad .zarray in $sub"))
      val n = meta.shape.head
      val cr = meta.chunks.head
      s.read.format("binaryFile").load(s"$root/$sub")
        .filter(!col("path").endsWith(".zarray"))
        .select("path", "content").as[(String, Array[Byte])]
        .flatMap { case (path, bytes) =>
          val name = path.substring(path.lastIndexOf('/') + 1)
          val idx = Zarr.chunkIndex(meta, name).getOrElse(
            sys.error(s"unexpected chunk file $name in $sub"))
          val arr = Zarr.decodeChunk(meta, bytes).getOrElse(
            sys.error(s"chunk $name in $sub rejected"))
          (0 until cr).flatMap { r =>
            val row = idx.head.toLong * cr + r
            if (row < n) Some((row, fact(arr, r))) else None
          }
        }
        .toDF("row", factName)
    }
    val emb = grid("emb", "emb_q") { (arr, r) =>
      var q = 0L
      var c = 0
      while (c < 64) { q += math.round(arr.at(r, c) * 1000); c += 1 }
      q
    }
    val ids = grid("ids", "vec_id")((arr, r) => arr.longAt(r, 0))
    val labels = grid("labels", "label")((arr, r) =>
      arr.at(r, 0).toLong)
    emb.join(ids, "row").join(labels, "row")
      .select(col("vec_id"), lit(64).as("dim"), col("emb_q"),
        col("label").cast("int").as("label"))
      .orderBy("vec_id")
  }
  /** Zarr V3 store read (late r12, operators/Zarr): the SAME
    * three-array embeddings story told in the NEW spec generation —
    * `zarr.json` metadata, codec chains, `c/…` chunk keys:
    * `emb` f4 SHARDED (sharding_indexed — 14-row shards holding
    * two 7-row inner chunks each behind bytes→blosc, the
    * crc32c-guarded offset index at the shard end — the v3 layout
    * big arrays actually use) with the v2-style dotted keys,
    * `ids` i8 under bytes→zstd→crc32c (the checksum codec live in
    * the gate), `labels` i4 BIG-endian bytes under gzip. One
    * binaryFile scan per grid with recursive lookup (default keys
    * nest directories), per-chunk decode, same per-vector oracle
    * as the v2 store. */
  private[graft] def zarr3Read(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Zarr
    val root = formatFixtureDir(dir, "zarr3s", "embeddings") { out =>
      val rows = Tables.embeddings(s, dir)
        .selectExpr("vec_id", "embedding", "label")
        .as[(Long, Array[Float], Int)].collect().sortBy(_._1)
      val n = rows.length.toLong
      def putIn(sub: String)(name: String, bytes: Array[Byte]) = {
        val f = new java.io.File(new java.io.File(out, sub), name)
        f.getParentFile.mkdirs()
        java.nio.file.Files.write(f.toPath, bytes): Unit
      }
      Zarr.write2dV3(
        Zarr.Meta3(Seq(n, 64L), Seq(14, 64), "f4",
          bigEndian = false, 0.0, Seq.empty, ".", "v2",
          sharding = Some(Zarr.Shard3(Seq(7, 64),
            innerBig = false, Seq(("blosc", 5)),
            indexCrc = true, indexAtEnd = true))),
        n, 64, (r, c) => rows(r.toInt)._2(c).toDouble,
        putIn("emb"))
      Zarr.write2dV3(
        Zarr.Meta3(Seq(n, 1L), Seq(7, 1), "i8",
          bigEndian = false, -1.0,
          Seq(("zstd", 3), ("crc32c", 0)), "/", "default"),
        n, 1, (r, _) => rows(r.toInt)._1.toDouble,
        putIn("ids"))
      Zarr.write2dV3(
        Zarr.Meta3(Seq(n, 1L), Seq(7, 1), "i4",
          bigEndian = true, -1.0, Seq(("gzip", 5)), "/",
          "default"),
        n, 1, (r, _) => rows(r.toInt)._3.toDouble,
        putIn("labels"))
    }
    def grid(sub: String, factName: String)(
        fact: (graft.operators.Npy.Arr, Int) => Long): DataFrame = {
      val metaJson = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$root/$sub/zarr.json")), "UTF-8")
      val meta = Zarr.parseMetaV3(metaJson).getOrElse(
        sys.error(s"bad zarr.json in $sub"))
      val n = meta.shape.head
      val cr = meta.chunks.head
      val base = s"$root/$sub"
      s.read.format("binaryFile")
        .option("recursiveFileLookup", "true").load(base)
        .filter(!col("path").endsWith("zarr.json"))
        .select("path", "content").as[(String, Array[Byte])]
        .flatMap { case (path, bytes) =>
          // chunk KEY = the path below the array root, with the
          // default encoding's directory separators intact
          val rel = path.substring(
            path.indexOf(base) + base.length + 1)
          val key = rel // '/' separators match the key encoding
          val idx = Zarr.chunkIndexV3(meta,
            if (meta.sep == ".") rel.replace("/", ".") else key)
            .getOrElse(
              sys.error(s"unexpected chunk file $rel in $sub"))
          val arr = Zarr.decodeChunkV3(meta, bytes).getOrElse(
            sys.error(s"chunk $rel in $sub rejected"))
          (0 until cr).flatMap { r =>
            val row = idx.head.toLong * cr + r
            if (row < n) Some((row, fact(arr, r))) else None
          }
        }
        .toDF("row", factName)
    }
    val emb = grid("emb", "emb_q") { (arr, r) =>
      var q = 0L
      var c = 0
      while (c < 64) { q += math.round(arr.at(r, c) * 1000); c += 1 }
      q
    }
    val ids = grid("ids", "vec_id")((arr, r) => arr.longAt(r, 0))
    val labels = grid("labels", "label")((arr, r) =>
      arr.at(r, 0).toLong)
    emb.join(ids, "row").join(labels, "row")
      .select(col("vec_id"), lit(64).as("dim"), col("emb_q"),
        col("label").cast("int").as("label"))
      .orderBy("vec_id")
  }
  /** ONNX model decode (r12) — per 8-vector shard one ModelProto
    * (operators/Onnx, on the same wire machinery as the tf.train
    * family): a 2-node MatMul→Relu graph whose initializers carry
    * the REAL embedding matrix (F32 [n,64]), ids (I64) and labels
    * (I32), with the tensor STORAGE PATH rotating three ways by
    * shard id — raw_data bytes, the typed packed fields
    * (float_data/int64_data/int32_data), and (late r12) EXTERNAL
    * data: the embedding matrix externalized to a side blob with
    * offset/length entries, resolved by the reader's location →
    * bytes function — so every wire form a reader must accept
    * stays live in the gate. A float8 FNUZ twin of the embedding
    * (E4M3FNUZ/E5M2FNUZ rotating by shard) decodes through the
    * closed-form converters and is held to its half-step error
    * bound in-flight. Facts from DECODED initializers + the
    * graph structure. */
  private[graft] def onnxParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Onnx._
    Tables.embeddings(s, dir)
      .selectExpr("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)]
      .map { case (id, emb, label) => (id / 8, id, emb, label) }
      .groupByKey(_._1)
      .mapGroups { (sid: Long,
          it: Iterator[(Long, Long, Array[Float], Int)]) =>
        val vecs = it.toSeq.sortBy(_._2)
        val n = vecs.length
        val dim = vecs.head._3.length
        val embBuf = java.nio.ByteBuffer.allocate(n * dim * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        vecs.foreach(_._3.foreach(embBuf.putFloat))
        val idBuf = java.nio.ByteBuffer.allocate(n * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        vecs.foreach(v => idBuf.putLong(v._2))
        val labBuf = java.nio.ByteBuffer.allocate(n * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        vecs.foreach(v => labBuf.putInt(v._4))
        // FNUZ float8 twin (late r12): the embedding quantized to
        // FLOAT8E4M3FNUZ(18) / FLOAT8E5M2FNUZ(20) rotating by shard
        // — held to its closed-form error bound at decode
        val f8Type = if (sid % 2 == 0) 18 else 20
        val f8 = new Array[Byte](n * dim)
        locally {
          var z = 0
          vecs.foreach(_._3.foreach { x =>
            f8(z) =
              if (f8Type == 18)
                graft.operators.Safetensors.floatToF8E4M3Fnuz(x)
              else graft.operators.Safetensors.floatToF8E5M2Fnuz(x)
            z += 1
          })
        }
        val m = OModel(8L, "graft", Seq(("", 17L)), s"shard$sid",
          Seq(ONode("mm", "MatMul", Seq("x", "emb"), Seq("h")),
            ONode("act", "Relu", Seq("h"), Seq("y"))),
          Seq(OTensor("emb", Seq(n.toLong, dim.toLong), 1,
            embBuf.array()),
            OTensor("vec_id", Seq(n.toLong), 7, idBuf.array()),
            OTensor("label", Seq(n.toLong), 6, labBuf.array()),
            OTensor("emb_f8", Seq(n.toLong, dim.toLong), f8Type,
              f8)),
          Seq("x"), Seq("y"))
        sid % 3 match {
          case 2 => // external: emb's bytes live in a side blob
            (sid, buildModel(m, externalize = Map(
              "emb" -> ((s"shard$sid.weights", 0L)))),
              embBuf.array())
          case r =>
            (sid, buildModel(m, rawData = r == 0),
              Array.emptyByteArray)
        }
      }
      .flatMap { case (sid, bytes, side) =>
        val resolver = (loc: String) =>
          if (loc == s"shard$sid.weights" && side.nonEmpty)
            Some(side) else None
        val m = parseModel(bytes, resolver).getOrElse(
          sys.error(s"onnx rejected shard $sid"))
        require(sid % 3 != 2 || side.nonEmpty)
        require(m.producer == "graft" && m.graphName == s"shard$sid"
          && m.opsets == Seq(("", 17L)))
        val ops = m.nodes.map(_.opType).mkString(",")
        val byName = m.initializers.map(t => t.name -> t).toMap
        val emb = byName("emb"); val ids = byName("vec_id")
        val lab = byName("label")
        require(emb.dataType == 1 && ids.dataType == 7 &&
          lab.dataType == 6 && emb.dims.length == 2)
        val n = emb.dims.head.toInt
        val dim = emb.dims(1).toInt
        // FNUZ twin: decode every lane through the closed-form
        // converter and hold it to the format's half-step bound
        // (normal: half a mantissa step of the binade; subnormal
        // plane: half the subnormal step) — a wrong bias, NaN
        // plane or rounding slip breaks the run in-flight
        val f8t = byName("emb_f8")
        val wantF8 = if (sid % 2 == 0) 18 else 20
        require(f8t.dataType == wantF8 && f8t.dims == emb.dims,
          s"shard $sid: f8 twin type ${f8t.dataType}")
        val f8tag = if (wantF8 == 18) "E4M3FNUZ" else "E5M2FNUZ"
        locally {
          var k = 0
          val total = n * dim
          while (k < total) {
            val x = f32At(emb, k)
            val dq =
              if (wantF8 == 18) f8e4m3fnuzAt(f8t, k)
              else f8e5m2fnuzAt(f8t, k)
            val bound =
              if (wantF8 == 18) math.abs(x) / 16f + math.pow(2, -11)
              else math.abs(x) / 8f + math.pow(2, -18)
            require(math.abs(dq - x) <= bound + 1e-9,
              s"$f8tag bound broken at shard $sid lane $k: " +
                s"$x -> $dq")
            k += 1
          }
        }
        (0 until n).map { i =>
          var q = 0L
          var j = 0
          while (j < dim) {
            q += math.round(f32At(emb, i * dim + j).toDouble * 1000)
            j += 1
          }
          (i64At(ids, i), sid, dim, q, i32At(lab, i), ops, f8tag)
        }
      }
      .toDF("vec_id", "shard_id", "dim", "emb_q", "label", "ops",
        "f8tag")
      .orderBy("vec_id")
  }
  /** HDF5 decode (r12) — THE scientific-corpus container
    * (operators/Hdf5): per 8-vector shard one `.h5` file holding
    * the embedding matrix f4 [n,64] DEFLATE-CHUNKED at [3,64] (so
    * edge chunks clip in the gate), ids i8 contiguous and labels i4
    * COMPACT (inline in the layout message) — all three data
    * layouts live — walked back through superblock v0 → root group
    * (local heap + B-tree v1 + SNOD) → object headers → layouts.
    * Facts from DECODED datasets under the shared embeddings
    * oracle. */
  private[graft] def hdf5Parse(s: SparkSession, dir: String): DataFrame =
    hdf5ShardRows(hdf5Shards(s, dir)).orderBy("vec_id")
  /** One `.h5` file per 8-vector shard (all three layouts; the
    * chunked `emb` dataset rotates its filter pipeline by shard id
    * — plain deflate, shuffle+deflate, deflate+fletcher32,
    * shuffle+deflate+fletcher32 — and the FILE FORMAT itself
    * rotates by a second axis: even shards write the CLASSIC
    * superblock-v0/v1-header form, odd shards the LIBVER-LATEST
    * form (superblock v3 + OHDR link messages + layout v4 chunk
    * indexes, late r12) — and the latest shards rotate the v4
    * CHUNK INDEX itself through fixed array / extensible array /
    * v2 b-tree (r13: the appendable `maxshape=` shapes h5py
    * writes), so every decode combination, both format
    * generations AND all three chunk indexes stay live in the
    * gate. */
  private[graft] def hdf5Shards(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    val spark = s
    import spark.implicits._
    import graft.operators.Hdf5
    Tables.embeddings(s, dir)
      .selectExpr("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)]
      .map { case (id, emb, label) => (id / 8, id, emb, label) }
      .groupByKey(_._1)
      .mapGroups { (sid: Long,
          it: Iterator[(Long, Long, Array[Float], Int)]) =>
        val vecs = it.toSeq.sortBy(_._2)
        val n = vecs.length
        val dim = vecs.head._3.length
        val embBuf = java.nio.ByteBuffer.allocate(n * dim * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        vecs.foreach(_._3.foreach(embBuf.putFloat))
        val idBuf = java.nio.ByteBuffer.allocate(n * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        vecs.foreach(v => idBuf.putLong(v._2))
        val labBuf = java.nio.ByteBuffer.allocate(n * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        vecs.foreach(v => labBuf.putInt(v._4))
        val dsets = Seq(
          Hdf5.WDataset("emb", Seq(n.toLong, dim.toLong), "f4",
            embBuf.array(), chunkDims = Seq(3, dim),
            shuffle = sid % 2 == 1, fletcher = (sid / 2) % 2 == 1,
            // latest shards rotate the v4 chunk index: fixed
            // array, extensible array, v2 b-tree (r13)
            chunkIndexKind = 3 + ((sid / 2) % 3).toInt),
          Hdf5.WDataset("vec_id", Seq(n.toLong), "i8",
            idBuf.array()),
          Hdf5.WDataset("label", Seq(n.toLong), "i4",
            labBuf.array(), compact = true))
        // latest shards also rotate DENSE root-group links (late
        // r14: fractal heap + name-index v2 b-tree) — the values
        // are link-storage-invariant, so the oracle pins that the
        // dense walk resolves the same children
        (sid, if (sid % 2 == 0) Hdf5.build(dsets)
          else Hdf5.buildLatest(dsets,
            denseLinks = (sid / 2) % 2 == 1))
      }
  }
  /** Decode (shardId, h5 bytes) rows — shared by the in-memory,
    * real-file and file-stream paths. */
  private[graft] def hdf5ShardRows(
      shards: org.apache.spark.sql.Dataset[(Long, Array[Byte])])
      : DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    import graft.operators.Hdf5
    shards
      .flatMap { case (sid, bytes) =>
        val ds = Hdf5.read(bytes).getOrElse(
          sys.error(s"hdf5 rejected shard $sid"))
        val byName = ds.map(d => d.path -> d).toMap
        require(byName.keySet == Set("emb", "vec_id", "label"))
        val emb = byName("emb"); val ids = byName("vec_id")
        val lab = byName("label")
        require(emb.arr.descr == "f4" && ids.arr.descr == "i8" &&
          lab.arr.descr == "i4" && emb.dims.length == 2)
        val n = emb.dims.head.toInt
        val dim = emb.dims(1).toInt
        (0 until n).map { i =>
          var q = 0L
          var j = 0
          while (j < dim) {
            q += math.round(emb.arr.at(i, j) * 1000); j += 1
          }
          (ids.arr.longAt(i), sid, dim, q, lab.arr.at(i).toInt)
        }
      }
      .toDF("vec_id", "shard_id", "dim", "emb_q", "label")
  }
  /** HDF5 extensible-array GROWTH lane (r14): one `.h5` whose 1-D
    * dataset carries one element per chunk, far past the 244-chunk
    * index-block-direct cliff — the walk exercises real SECONDARY
    * blocks ("EASB") and, with 64-element pages (eaPageBits 6),
    * PAGED data blocks with per-page checksums and the page-init
    * bitmap. Facts re-derived from the decoded array under the
    * documents oracle. */
  private[graft] def hdf5ParseDeep(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Hdf5
    Tables.documents(s, dir)
      .selectExpr("doc_id", "n_chars")
      .as[(Long, Long)]
      .groupByKey(_ => 0L)
      .mapGroups { (_, it) =>
        val docs = it.toSeq.sortBy(_._1)
        val n = docs.length
        // 4 lanes per doc: at gate scale (sf0.01, ~500 docs) the
        // 4n one-element chunks reach super block 6, whose data
        // blocks (128 elems > the 64-elem pages) are PAGED
        val vals = java.nio.ByteBuffer.allocate(n * 16)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        docs.foreach { d =>
          (0 until 4).foreach(_ => vals.putFloat(d._2.toFloat))
        }
        val ids = java.nio.ByteBuffer.allocate(n * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        docs.foreach(d => ids.putLong(d._1))
        Hdf5.buildLatest(Seq(
          Hdf5.WDataset("n_chars", Seq(4L * n), "f4",
            vals.array(), chunkDims = Seq(1),
            chunkIndexKind = 4, eaPageBits = 6,
            shuffle = true, fletcher = true),
          // the SAME values again behind a PAGED FIXED ARRAY
          // (2000 one-element chunks at 64-entry pages) — both v4
          // paging shapes live in one gate file
          Hdf5.WDataset("n_chars_fa", Seq(4L * n), "f4",
            vals.array(), chunkDims = Seq(1),
            chunkIndexKind = 3, eaPageBits = 6),
          Hdf5.WDataset("doc_id", Seq(n.toLong), "i8",
            ids.array())))
      }
      .flatMap { bytes =>
        val ds = Hdf5.read(bytes).getOrElse(
          sys.error("hdf5 rejected the deep-growth file"))
        val byName = ds.map(d => d.path -> d).toMap
        val nc = byName("n_chars"); val ids = byName("doc_id")
        val fa = byName("n_chars_fa")
        val n = byName("doc_id").dims.head.toInt
        require(nc.dims.head == 4L * n)
        // the paged-fixed-array twin must agree lane for lane
        require(fa.dims.head == 4L * n &&
          (0 until 4 * n).forall(k => fa.arr.at(k) == nc.arr.at(k)),
          "fixed-array twin disagrees with the extensible array")
        // paged data blocks start past chunk 500 (super block 5,
        // 128-element blocks > the 64-element pages)
        require(4 * n > 500,
          s"growth lane must reach the paged range (4n=${4 * n})")
        (0 until n).map { i =>
          val v = nc.arr.at(4 * i).toLong
          require((1 until 4).forall(k =>
            nc.arr.at(4 * i + k).toLong == v), s"lane drift at $i")
          (ids.arr.longAt(i), v)
        }
      }
      .toDF("doc_id", "n_chars")
      .orderBy("doc_id")
  }

  /** The shards as REAL `.h5` FILES (cached fixture tree). */
  private[graft] def hdf5FixtureRoot(s: SparkSession, dir: String)
      : String = {
    val spark = s
    import spark.implicits._
    formatFixtureDir(dir, "hdf5v24", "embeddings") { out =>
      hdf5Shards(s, dir)
        .map { case (sid, bytes) =>
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.h5"), bytes)
          sid
        }
        .count(): Unit
    }
  }
  /** [[hdf5Parse]] through REAL `.h5` files + binaryFile — the
    * layout scientific corpora actually arrive in. Identical
    * oracle: the file layer must be transparent. */
  private[graft] def hdf5ParseFiles(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    val root = hdf5FixtureRoot(s, dir)
    hdf5ShardRows(
      s.read.format("binaryFile").option("pathGlobFilter", "*.h5")
        .load(root)
        .repartition(col("path"))
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])]
        .map { case (path, bytes) =>
          val name = path.substring(path.lastIndexOf('/') + 1)
          (name.stripPrefix("shard-").stripSuffix(".h5").toLong,
            bytes)
        })
      .orderBy("vec_id")
  }
  /** Cross-format tensor differential (r12, widened late-r12 to
    * SIX lanes) — the SAME embedding shard encoded into six
    * independent container paths implemented in this repo
    * (safetensors, GGUF, ONNX, HDF5 classic, HDF5 libver-latest
    * with OHDR/fixed-array/shuffle/fletcher32, and a SHARDED zarr
    * v3 chunk behind blosc + a crc32c index: different headers,
    * different layout machinery, different chunking paths) and
    * decoded by their independent readers, which must agree
    * LANE-FOR-LANE in-flight before one agreed fact row ships to
    * the oracle. A bug in any one codec breaks the agreement even
    * if it would round-trip through itself. */
  private[graft] def tensorCrossCheck(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    Tables.embeddings(s, dir)
      .selectExpr("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)]
      .map { case (id, emb, label) => (id / 8, id, emb, label) }
      .groupByKey(_._1)
      .flatMapGroups { (sid: Long,
          it: Iterator[(Long, Long, Array[Float], Int)]) =>
        val vecs = it.toSeq.sortBy(_._2)
        val n = vecs.length
        val dim = vecs.head._3.length
        val flat = vecs.flatMap(_._3).toArray
        def le(f: Array[Float]): Array[Byte] = {
          val b = java.nio.ByteBuffer.allocate(f.length * 4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          f.foreach(b.putFloat); b.array()
        }
        // four encodes
        val st = graft.operators.Safetensors.build(Seq(
          graft.operators.Safetensors.Tensor("emb", "F32",
            Seq(n.toLong, dim.toLong), le(flat))))
        val gg = graft.operators.Gguf.build(Seq.empty, Seq(
          graft.operators.Gguf.GTensor("emb",
            Seq(dim.toLong, n.toLong), "F32", le(flat))))
        val on = graft.operators.Onnx.buildModel(
          graft.operators.Onnx.OModel(8L, "graft", Seq(("", 17L)),
            "x", Seq.empty, Seq(graft.operators.Onnx.OTensor("emb",
              Seq(n.toLong, dim.toLong), 1, le(flat))),
            Seq.empty, Seq.empty),
          rawData = sid % 2 == 0)
        val h5 = graft.operators.Hdf5.build(Seq(
          graft.operators.Hdf5.WDataset("emb",
            Seq(n.toLong, dim.toLong), "f4", le(flat),
            chunkDims = Seq(3, dim))))
        // lane 5: the libver-latest generation (OHDR, layout v4
        // fixed-array index, shuffle+fletcher32 filters)
        val h5l = graft.operators.Hdf5.buildLatest(Seq(
          graft.operators.Hdf5.WDataset("emb",
            Seq(n.toLong, dim.toLong), "f4", le(flat),
            chunkDims = Seq(3, dim), shuffle = true,
            fletcher = true)))
        // lane 6: one SHARDED zarr v3 chunk (1-row inner chunks
        // behind blosc, crc32c-guarded index; odd shards store the
        // inner blocks TRANSPOSED — the order='F' sharded form)
        val z3meta = graft.operators.Zarr.Meta3(
          Seq(n.toLong, dim.toLong), Seq(n, dim), "f4",
          bigEndian = false, 0.0, Seq.empty, "/", "default",
          sharding = Some(graft.operators.Zarr.Shard3(
            Seq(1, dim), innerBig = false, Seq(("blosc", 5)),
            indexCrc = true, indexAtEnd = true,
            innerPerm = if (sid % 2 == 0) Seq.empty
              else Seq(1, 0))))
        val z3 = graft.operators.Zarr.encodeChunkV3(z3meta,
          le(flat))
        // six decodes
        val stT = graft.operators.Safetensors.parse(st)
          .getOrElse(sys.error(s"st rejected $sid"))._2.head
        val ggT = graft.operators.Gguf.parse(gg)
          .getOrElse(sys.error(s"gguf rejected $sid"))._2.head
        val onT = graft.operators.Onnx.parseModel(on)
          .getOrElse(sys.error(s"onnx rejected $sid"))
          .initializers.head
        val h5T = graft.operators.Hdf5.read(h5)
          .getOrElse(sys.error(s"hdf5 rejected $sid")).head
        val h5lT = graft.operators.Hdf5.read(h5l)
          .getOrElse(sys.error(s"hdf5-latest rejected $sid")).head
        val z3T = graft.operators.Zarr.decodeChunkV3(z3meta, z3)
          .getOrElse(sys.error(s"zarr3 rejected $sid"))
        // lane-for-lane agreement, then ONE agreed fact row per vec
        vecs.indices.map { i =>
          var q = 0L
          var j = 0
          while (j < dim) {
            val k = i * dim + j
            val a = graft.operators.Safetensors.f32At(stT, k)
            val b = graft.operators.Gguf.f32At(ggT, k)
            val c = graft.operators.Onnx.f32At(onT, k)
            val d = h5T.arr.floatAt(i, j)
            val e = h5lT.arr.floatAt(i, j)
            val f = z3T.floatAt(i, j)
            val bits = java.lang.Float.floatToIntBits(a)
            require(
              bits == java.lang.Float.floatToIntBits(b) &&
              bits == java.lang.Float.floatToIntBits(c) &&
              bits == java.lang.Float.floatToIntBits(d) &&
              bits == java.lang.Float.floatToIntBits(e) &&
              bits == java.lang.Float.floatToIntBits(f),
              s"codec disagreement at shard $sid vec $i lane $j")
            q += math.round(a.toDouble * 1000)
            j += 1
          }
          (vecs(i)._2, sid, dim, q, 6)
        }
      }
      .toDF("vec_id", "shard_id", "dim", "emb_q", "n_formats")
      .orderBy("vec_id")
  }
  /** Temporal Arrow columns (r12): date32 / timestamp[us, UTC] /
    * duration[ms] — the metadata columns dataset shards carry beside
    * the payload. arrow-java writes (its Date/Time/Duration tables
    * OMIT unit fields equal to the .fbs defaults, which is exactly
    * the vtable subtlety this pins); OUR reader surfaces the raw
    * counts, oracle-predicted from documents. */
  private[graft] def arrowIpcTemporal(s: SparkSession, dir: String)
      : DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) => (id / 8, id, t.length.toLong) }
      .groupByKey(_._1)
      .mapGroups { (sid: Long, it: Iterator[(Long, Long, Long)]) =>
        val docs = it.toSeq.sortBy(_._2)
        (sid, buildArrowTemporalShard(docs.map {
          case (_, id, n) => (id, n) }))
      }
      .flatMap { case (sid, bytes) =>
        val (cols, rows) = graft.operators.ArrowIpc.parseFile(bytes)
          .getOrElse(sys.error(s"arrow temporal rejected shard $sid"))
        require(cols.map(_.tag) ==
          Seq("int64", "date32", "timestamp_us", "duration_ms"))
        rows.map { r =>
          (r(0).get.asInstanceOf[Long], sid,
            r(1).get.asInstanceOf[Int],
            r(2).map(_.asInstanceOf[Long]),
            r(3).get.asInstanceOf[Long])
        }
      }
      .toDF("doc_id", "shard_id", "day", "ts_us", "dur_ms")
      .orderBy("doc_id")
  }
  /** One 8-doc shard of temporal columns; ts null every 7th doc. */
  private[graft] def buildArrowTemporalShard(
      docs: Seq[(Long, Long)]): Array[Byte] = {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field,
      FieldType, Schema => ASchema}
    import org.apache.arrow.vector.types.{DateUnit, TimeUnit}
    import org.apache.arrow.vector._
    import scala.jdk.CollectionConverters._
    val schema = new ASchema(Seq(
      new Field("id", new FieldType(false,
        new ArrowType.Int(64, true), null), null),
      new Field("day", new FieldType(false,
        new ArrowType.Date(DateUnit.DAY), null), null),
      new Field("ts", new FieldType(true,
        new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC"), null),
        null),
      new Field("dur", new FieldType(false,
        new ArrowType.Duration(TimeUnit.MILLISECOND), null), null))
      .asJava)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val root = VectorSchemaRoot.create(schema, alloc)
      try {
        root.allocateNew()
        val ids = root.getVector("id").asInstanceOf[BigIntVector]
        val day = root.getVector("day").asInstanceOf[DateDayVector]
        val ts = root.getVector("ts").asInstanceOf[TimeStampMicroTZVector]
        val dur = root.getVector("dur").asInstanceOf[DurationVector]
        docs.zipWithIndex.foreach { case ((id, n), i) =>
          ids.setSafe(i, id)
          day.setSafe(i, (19000 + id % 1000).toInt)
          if (id % 7 == 3) ts.setNull(i)
          else ts.setSafe(i, 1700000000000000L + id * 1000003L)
          dur.setSafe(i, n * 250L)
        }
        root.setRowCount(docs.length)
        val buf = new java.io.ByteArrayOutputStream()
        val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root,
          null, java.nio.channels.Channels.newChannel(buf))
        w.start(); w.writeBatch(); w.end(); w.close()
        buf.toByteArray
      } finally root.close()
    } finally alloc.close()
  }
  /** The per-shard nested `.arrow` files: (shard_id, bytes). */
  /** Per-shard Arrow files carrying a MAP column and a DECIMAL128
    * column (r12): the remaining HuggingFace-datasets shapes after
    * list/struct/dictionary — feature dictionaries ship as
    * map<utf8,int64>, currency/score columns as decimal. The map is
    * the word-length histogram of the whitespace split (key = the
    * length as a string, value = its count, value NULL when the
    * length is a multiple of 7, whole map NULL every 13th doc); the
    * decimal is analytic from doc_id (unscaled (id*137+41) %
    * 1000003 at scale 4, NULL every 11th doc). */
  private[graft] def arrowMapShards(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    val spark = s
    import spark.implicits._
    Tables.documents(s, dir)
      .filter(expr("length(text) = octet_length(text) AND length(text) > 0"))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) => (id / 8, id, t) }
      .groupByKey(_._1)
      .mapGroups { (sid: Long, it: Iterator[(Long, Long, String)]) =>
        val docs = it.toSeq.sortBy(_._2)
        (sid, buildArrowMapShard(docs.map { case (_, id, t) => (id, t) }))
      }
  }
  private[graft] def buildArrowMapShard(docs: Seq[(Long, String)])
      : Array[Byte] = {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field,
      FieldType, Schema => ASchema}
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.complex.{MapVector, StructVector}
    import scala.jdk.CollectionConverters._
    def f(name: String, t: ArrowType, nullable: Boolean,
        kids: Field*): Field =
      new Field(name, new FieldType(nullable, t, null),
        if (kids.isEmpty) null else kids.asJava)
    val schema = new ASchema(Seq(
      f("id", new ArrowType.Int(64, true), nullable = false),
      f("wlen", new ArrowType.Map(false), nullable = true,
        f(MapVector.DATA_VECTOR_NAME, ArrowType.Struct.INSTANCE,
          nullable = false,
          f(MapVector.KEY_NAME, ArrowType.Utf8.INSTANCE,
            nullable = false),
          f(MapVector.VALUE_NAME, new ArrowType.Int(64, true),
            nullable = true))),
      f("price", new ArrowType.Decimal(20, 4, 128),
        nullable = true)).asJava)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val root = VectorSchemaRoot.create(schema, alloc)
      try {
        root.allocateNew()
        val ids = root.getVector("id").asInstanceOf[BigIntVector]
        val mv = root.getVector("wlen").asInstanceOf[MapVector]
        val ev = mv.getDataVector.asInstanceOf[StructVector]
        val keys = ev.getChild(MapVector.KEY_NAME)
          .asInstanceOf[VarCharVector]
        val vals = ev.getChild(MapVector.VALUE_NAME)
          .asInstanceOf[BigIntVector]
        val price = root.getVector("price").asInstanceOf[DecimalVector]
        var off = 0
        docs.zipWithIndex.foreach { case ((id, t), i) =>
          ids.setSafe(i, id)
          if (id % 13 == 9) mv.setNull(i)
          else {
            mv.startNewValue(i)
            val hist = t.split(" ").filter(_.nonEmpty)
              .groupBy(_.length).view.mapValues(_.length.toLong)
              .toSeq.sortBy(_._1)
            hist.foreach { case (len, cnt) =>
              ev.setIndexDefined(off)
              keys.setSafe(off, len.toString.getBytes("UTF-8"))
              if (len % 7 == 0) vals.setNull(off)
              else vals.setSafe(off, cnt)
              off += 1
            }
            mv.endValue(i, hist.length)
          }
          if (id % 11 == 10) price.setNull(i)
          else price.setSafe(i, new java.math.BigDecimal(
            java.math.BigInteger.valueOf((id * 137 + 41) % 1000003), 4))
        }
        root.setRowCount(docs.length)
        val buf = new java.io.ByteArrayOutputStream()
        val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root,
          null, java.nio.channels.Channels.newChannel(buf))
        w.start(); w.writeBatch(); w.end(); w.close()
        buf.toByteArray
      } finally root.close()
    } finally alloc.close()
  }
  private[graft] def arrowNestedShards(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    val spark = s
    import spark.implicits._
    Tables.documents(s, dir)
      .filter(expr("length(text) = octet_length(text) AND length(text) > 0"))
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, t, lang) => (id / 8, id, t, lang) }
      .groupByKey(_._1)
      .mapGroups { (sid: Long, it: Iterator[(Long, Long, String, String)]) =>
        val docs = it.toSeq.sortBy(_._2)
        (sid, buildArrowNestedShard(docs.map {
          case (_, id, t, l) => (id, t, l) }))
      }
  }
  /** One 8-doc nested Arrow file via arrow-java: tokens are the word
    * lengths of the whitespace split (element null when the length is
    * a multiple of 5; whole list null every 13th doc), meta carries
    * n_chars + lang (lang null every 11th doc — the label rule). */
  private[graft] def buildArrowNestedShard(
      docs: Seq[(Long, String, String)]): Array[Byte] = {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field,
      FieldType, Schema => ASchema}
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.complex.{ListVector, StructVector}
    import scala.jdk.CollectionConverters._
    def f(name: String, t: ArrowType, nullable: Boolean,
        kids: Field*): Field =
      new Field(name, new FieldType(nullable, t, null),
        if (kids.isEmpty) null else kids.asJava)
    val schema = new ASchema(Seq(
      f("id", new ArrowType.Int(64, true), nullable = false),
      f("tokens", ArrowType.List.INSTANCE, nullable = true,
        f("item", new ArrowType.Int(64, true), nullable = true)),
      f("meta", ArrowType.Struct.INSTANCE, nullable = false,
        f("n_chars", new ArrowType.Int(64, true), nullable = false),
        f("lang", ArrowType.Utf8.INSTANCE, nullable = true))).asJava)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val root = VectorSchemaRoot.create(schema, alloc)
      try {
        root.allocateNew()
        val ids = root.getVector("id").asInstanceOf[BigIntVector]
        val toks = root.getVector("tokens").asInstanceOf[ListVector]
        val tokData = toks.getDataVector.asInstanceOf[BigIntVector]
        val meta = root.getVector("meta").asInstanceOf[StructVector]
        val mChars = meta.getChild("n_chars").asInstanceOf[BigIntVector]
        val mLang = meta.getChild("lang").asInstanceOf[VarCharVector]
        var off = 0
        docs.zipWithIndex.foreach { case ((id, t, lang), i) =>
          ids.setSafe(i, id)
          if (id % 13 == 9) toks.setNull(i)
          else {
            toks.startNewValue(i)
            val ws = t.split(" ").filter(_.nonEmpty)
            ws.zipWithIndex.foreach { case (w, j) =>
              if (w.length % 5 == 0) tokData.setNull(off + j)
              else tokData.setSafe(off + j, w.length.toLong)
            }
            toks.endValue(i, ws.length)
            off += ws.length
          }
          meta.setIndexDefined(i)
          mChars.setSafe(i, t.length.toLong)
          if (id % 11 == 10) mLang.setNull(i)
          else mLang.setSafe(i, lang.getBytes("UTF-8"))
        }
        root.setRowCount(docs.length)
        val buf = new java.io.ByteArrayOutputStream()
        val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root,
          null, java.nio.channels.Channels.newChannel(buf))
        w.start(); w.writeBatch(); w.end(); w.close()
        buf.toByteArray
      } finally root.close()
    } finally alloc.close()
  }
  /** hdf5_parse / hdf5_parse_files shared oracle (per-vector facts
    * with the 8-vector shard id). */
  private[graft] def hdf5OracleSqlShared: String =
    """WITH q AS (
      |  SELECT vec_id, label, len(embedding) AS dim,
      |    CAST(coalesce(list_sum(list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))),
      |      0) AS BIGINT) AS s
      |  FROM embeddings)
      |SELECT vec_id, vec_id // 8 AS shard_id,
      |  CAST(dim AS INT) AS dim, s AS emb_q,
      |  CAST(label AS INT) AS label
      |FROM q ORDER BY vec_id""".stripMargin
  private[graft] def arrowIpcOracleSql: String =
    """WITH d AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE length(text) = strlen(text) AND length(text) > 0)
      |SELECT doc_id, doc_id // 8 AS shard_id,
      |  strlen(text) AS len, md5(text) AS md5,
      |  CASE WHEN doc_id % 11 = 10 THEN NULL
      |    ELSE 'label' || (doc_id % 4) END AS label,
      |  strlen(text) * 0.25 AS score
      |FROM d ORDER BY doc_id""".stripMargin
  /** arrow/avro_sink_roundtrip shared oracle. */
  private[graft] def sinkRoundtripOracleSql: String =
    """WITH d AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE length(text) = strlen(text) AND length(text) > 0),
      |t AS (
      |  SELECT doc_id, text,
      |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
      |  FROM d)
      |SELECT doc_id, strlen(text) AS len, md5(text) AS md5,
      |  CASE WHEN doc_id % 11 = 10 THEN NULL
      |    ELSE 'label' || (doc_id % 4) END AS label,
      |  strlen(text) * 0.25 AS score,
      |  CAST(len(ws) AS BIGINT) AS n_toks,
      |  CAST(coalesce(list_sum(list_transform(ws,
      |    w -> CAST(strlen(w) AS BIGINT))), 0) AS BIGINT) AS tok_sum
      |FROM t ORDER BY doc_id""".stripMargin
  /** TFRecord shard walk (operators/TfRecord) — the third standard
    * training-shard container beside WebDataset tar and ZIP: 8
    * documents frame into one shard, the parse verifies BOTH masked
    * CRC32Cs per record, and record positions identify samples (the
    * format carries no names — order IS identity, which is why the
    * oracle pins pos exactly). Same shuffle shape as tar_parse. */
  private[graft] def tfrecordParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    asciiDocs(s, dir)
      .map { case (id, t) =>
        (id / 8, id, graft.operators.TfRecord.buildRecord(
          t.getBytes("UTF-8")))
      }
      .groupByKey(_._1)
      .flatMapGroups { (sid: Long, it: Iterator[(Long, Long, Array[Byte])]) =>
        val recs = it.toSeq.sortBy(_._2)
        val shard = graft.operators.TfRecord.buildShard(recs.map(_._3))
        graft.operators.TfRecord.parse(shard).zipWithIndex.map {
          case (r, i) => (recs(i)._2, sid, i.toLong, r.length, r.md5)
        }
      }
      .toDF("doc_id", "shard_id", "pos", "length", "md5")
      .orderBy("doc_id")
  }
  /** tf.train.Example payloads INSIDE TFRecord framing
    * (operators/Protobuf + operators/TfRecord) — the full training-
    * shard stack as TensorFlow ships it: each document serializes to
    * an Example proto (int64 `id`, bytes `text`, a packed 3-element
    * int64 list `marks`, a float `score`), frames into a
    * double-CRC32C TFRecord, and 8-doc shards are parsed back —
    * framing CRCs verified, then the protobuf wire walk re-derives
    * every fact from the DECODED feature values, so varints, packed
    * lists, map entries and IEEE-754 floats must all be
    * value-transparent. `score` is (id % 256)/2 — exactly
    * representable in float32, so the float→double widening matches
    * the oracle's DOUBLE arithmetic bit-for-bit. Same shuffle shape
    * as tar_parse: one shard-keyed shuffle to assemble, flatMap to
    * parse. */
  private[graft] def tfexampleParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Protobuf
    asciiDocs(s, dir)
      .map { case (id, t) =>
        val ex = Protobuf.buildExample(Seq(
          "id" -> Protobuf.IntVals(Seq(id)),
          "text" -> Protobuf.BytesVals(Seq(t.getBytes("UTF-8"))),
          "marks" -> Protobuf.IntVals(Seq(id, t.length.toLong, id % 7)),
          "score" -> Protobuf.FloatVals(Seq((id % 256).toFloat / 2f))))
        (id / 8, id, graft.operators.TfRecord.buildRecord(ex))
      }
      .groupByKey(_._1)
      .flatMapGroups { (sid: Long, it: Iterator[(Long, Long, Array[Byte])]) =>
        val recs = it.toSeq.sortBy(_._2)
        val shard = graft.operators.TfRecord.buildShard(recs.map(_._3))
        val bytes = shard // one pass: framing walk, then proto walk
        graft.operators.TfRecord.parse(bytes).zipWithIndex.map {
          case (r, i) =>
            val payload = java.util.Arrays.copyOfRange(
              bytes, r.dataOff, r.dataOff + r.length.toInt)
            val feats = Protobuf.parseExample(payload)
              .getOrElse(sys.error(s"bad Example in shard $sid pos $i"))
            val m = feats.toMap
            val docId = m("id").asInstanceOf[Protobuf.IntVals].vs.head
            val text = m("text").asInstanceOf[Protobuf.BytesVals].vs.head
            val marks = m("marks").asInstanceOf[Protobuf.IntVals].vs
            val score = m("score").asInstanceOf[Protobuf.FloatVals].vs.head
            val d = java.security.MessageDigest.getInstance("MD5")
            (docId, sid, i.toLong, feats.length,
              text.length.toLong,
              d.digest(text).map("%02x".format(_)).mkString,
              marks.sum, score.toDouble)
        }
      }
      .toDF("doc_id", "shard_id", "pos", "n_feats", "text_len",
        "text_md5", "marks_sum", "score")
      .orderBy("doc_id")
  }
  /** tf.train.SequenceExample through TFRecord framing (r12) — the
    * standard shape for speech/video training data: per-document
    * context features (id, lang, n_chars) plus two aligned
    * feature_lists, one Feature per WORD step ("words" = bytes,
    * "lens" = [len, len%7] int64s). Build and parse are both OUR
    * closed-form walkers (operators/Protobuf, runtime-differential
    * in ProtobufSpec); every fact re-derived from decoded steps.
    * Same shard shuffle + flatMap shape as tfexample_parse. */
  private[graft] def tfsequenceParse(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    import graft.operators.Protobuf
    Tables.documents(s, dir)
      .filter(expr("length(text) = octet_length(text) AND length(text) > 0"))
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, t, lang) =>
        val ws = t.split(" ").filter(_.nonEmpty).toSeq
        val se = Protobuf.buildSequenceExample(
          context = Seq(
            "id" -> Protobuf.IntVals(Seq(id)),
            "lang" -> Protobuf.BytesVals(Seq(lang.getBytes("UTF-8"))),
            "n" -> Protobuf.IntVals(Seq(t.length.toLong))),
          featureLists = Seq(
            "words" -> ws.map(w =>
              Protobuf.BytesVals(Seq(w.getBytes("UTF-8")))),
            "lens" -> ws.map(w => Protobuf.IntVals(
              Seq(w.length.toLong, (w.length % 7).toLong)))))
        (id / 8, id, graft.operators.TfRecord.buildRecord(se))
      }
      .groupByKey(_._1)
      .flatMapGroups { (sid: Long, it: Iterator[(Long, Long, Array[Byte])]) =>
        val recs = it.toSeq.sortBy(_._2)
        val shard = graft.operators.TfRecord.buildShard(recs.map(_._3))
        graft.operators.TfRecord.parse(shard).zipWithIndex.map {
          case (r, i) =>
            val payload = java.util.Arrays.copyOfRange(
              shard, r.dataOff, r.dataOff + r.length.toInt)
            val (ctx, lists) = Protobuf.parseSequenceExample(payload)
              .getOrElse(sys.error(
                s"bad SequenceExample in shard $sid pos $i"))
            val cm = ctx.toMap
            val docId = cm("id").asInstanceOf[Protobuf.IntVals].vs.head
            val lang = new String(
              cm("lang").asInstanceOf[Protobuf.BytesVals].vs.head, "UTF-8")
            val lm = lists.toMap
            val words = lm("words").map(
              _.asInstanceOf[Protobuf.BytesVals].vs.head)
            val lens = lm("lens").map(
              _.asInstanceOf[Protobuf.IntVals].vs)
            require(words.length == lens.length,
              "feature_lists misaligned")
            val joined = words.map(new String(_, "UTF-8")).mkString(" ")
            val d = java.security.MessageDigest.getInstance("MD5")
            (docId, sid, i.toLong, lang, ctx.length,
              words.length.toLong,
              d.digest(joined.getBytes("UTF-8"))
                .map("%02x".format(_)).mkString,
              lens.map(_.head).sum, lens.map(_(1)).sum)
        }
      }
      .toDF("doc_id", "shard_id", "pos", "lang", "n_ctx", "n_steps",
        "words_md5", "len_sum", "mod_sum")
      .orderBy("doc_id")
  }
  /** The user-facing DataFrame source over `.arrow` trees (r12,
    * sources/ArrowSource): the shard columns surface as REAL typed
    * Spark columns, so the facts here are derived with plain SQL
    * expressions over the DataFrame — no hand-decoding in the query.
    * Same oracle as arrow_ipc_parse: the source layer must be
    * value-transparent end to end. */
  private[graft] def arrowSourceRead(s: SparkSession, dir: String): DataFrame = {
    val root = arrowFixtureRoot(s, dir)
    graft.sources.ArrowSource.read(s, root)
      .selectExpr("id AS doc_id", "id DIV 8 AS shard_id",
        "CAST(length(text) AS BIGINT) AS len",
        "md5(CAST(text AS BINARY)) AS md5", "label", "score")
      .orderBy("doc_id")
  }
  /** Sink→source round trip under the oracle (r12): a documents
    * projection — including a NESTED token-length array built with
    * plain Spark SQL — is written by [[sources.ArrowSink]] (one
    * `.arrow` file per partition) and read back by
    * [[sources.ArrowSource]]; every fact is re-derived from the
    * read-back DataFrame with SQL, and DuckDB predicts them from
    * documents. Any sink-side vector fill bug, batch-boundary bug or
    * source-side decode bug flips the hash. */
  private[graft] def arrowSinkRoundtrip(s: SparkSession, dir: String)
      : DataFrame =
    sinkRoundtripFacts(s,
      formatFixtureDir(dir, "arrowsink", "documents") { out =>
        graft.sources.ArrowSink.write(
          sinkRoundtripInput(s, dir).repartition(8), out,
          rowsPerBatch = 256)
      }, arrow = true)
  /** The projection both sinks write: id, text, nullable label,
    * score, and a token-length array (the nested column). */
  private[graft] def sinkRoundtripInput(s: SparkSession, dir: String)
      : DataFrame =
    Tables.documents(s, dir)
      .filter(expr("length(text) = octet_length(text) AND length(text) > 0"))
      .selectExpr(
        "doc_id AS id", "text",
        "CASE WHEN doc_id % 11 = 10 THEN NULL " +
          "ELSE concat('label', doc_id % 4) END AS label",
        "CAST(length(text) * 0.25 AS DOUBLE) AS score",
        "transform(filter(split(text, ' '), w -> w <> ''), " +
          "w -> CAST(length(w) AS BIGINT)) AS toks")
  private[graft] def sinkRoundtripFacts(s: SparkSession, root: String,
      arrow: Boolean): DataFrame = {
    val df = if (arrow) graft.sources.ArrowSource.read(s, root)
      else graft.sources.AvroSource.read(s, root)
    df.selectExpr(
        "id AS doc_id",
        "CAST(length(text) AS BIGINT) AS len",
        "md5(CAST(text AS BINARY)) AS md5",
        "label", "score",
        "CAST(size(toks) AS BIGINT) AS n_toks",
        "aggregate(toks, 0L, (a, x) -> a + x) AS tok_sum")
      .orderBy("doc_id")
  }
  /** TFRecord shards through REAL FILES — the [[tfrecordParse]] walk
    * over a written `.tfrecord` fixture tree via the binaryFile
    * source. TFRecord carries no names, so order IS identity: the
    * query reports (shard, pos, length, md5) and the oracle predicts
    * pos by rank within the 8-doc shard. Parse verifies both masked
    * CRC32Cs per record ([[graft.operators.TfRecord]]). */
  private[graft] def tfrecordParseFiles(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val root = formatFixtureDir(dir, "tfrecshard", "documents") { out =>
      asciiDocs(s, dir)
        .map { case (id, t) =>
          (id / 8, id,
            graft.operators.TfRecord.buildRecord(t.getBytes("UTF-8")))
        }
        .groupByKey(_._1)
        .mapGroups { (sid: Long, it: Iterator[(Long, Long, Array[Byte])]) =>
          val shard = graft.operators.TfRecord.buildShard(
            it.toSeq.sortBy(_._2).map(_._3))
          java.nio.file.Files.write(java.nio.file.Paths.get(
            out, f"shard-$sid%06d.tfrecord"), shard)
          sid
        }
        .count(): Unit
    }
    parseTfRecordFileRows(
      s.read.format("binaryFile").option("pathGlobFilter", "*.tfrecord").load(root)
        .repartition(col("path")))
      .orderBy("shard_id", "pos")
  }
  private[graft] def tfrecordFixtureRoot(s: SparkSession, dir: String)
      : String = {
    tfrecordParseFiles(s, dir) // constructing the query builds the fixture
    formatFixtureDir(dir, "tfrecshard", "documents")(_ => ())
  }
  /** The per-file TFRecord walk shared by the batch query and the
    * binaryFile STREAM twin (TfRecordFileStreamSpec). */
  private[graft] def parseTfRecordFileRows(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        val sid = name.stripPrefix("shard-")
          .stripSuffix(".tfrecord").toLong
        graft.operators.TfRecord.parse(bytes).zipWithIndex.map {
          case (r, i) => (sid, i.toLong, r.length, r.md5)
        }
      }
      .toDF("shard_id", "pos", "length", "md5")
  }

  /** This part's oracle SQL entries (the `oracleSql` slice). */
  private[graft] def tensorOracleSql: Map[String, String] = Map(
    "tfrecord_parse" -> {
      // order IS identity in TFRecord: pos = rank within the 8-doc
      // shard over EXISTING (ascii) docs
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id, doc_id // 8 AS shard_id,
        |  row_number() OVER (PARTITION BY doc_id // 8 ORDER BY doc_id)
        |    - 1 AS pos,
        |  strlen(text) AS length, md5(text) AS md5
        |FROM d ORDER BY doc_id""".stripMargin
    },
    "tfexample_parse" -> {
      // every fact re-derived from DECODED tf.train.Example features,
      // so the varint/packed-list/map-entry/IEEE-float stack must be
      // value-transparent; score = (id % 256)/2 is float32-exact so
      // DOUBLE arithmetic agrees bit-for-bit
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id, doc_id // 8 AS shard_id,
        |  row_number() OVER (PARTITION BY doc_id // 8 ORDER BY doc_id)
        |    - 1 AS pos,
        |  CAST(4 AS INT) AS n_feats,
        |  strlen(text) AS text_len, md5(text) AS text_md5,
        |  doc_id + strlen(text) + doc_id % 7 AS marks_sum,
        |  CAST(doc_id % 256 AS DOUBLE) / 2 AS score
        |FROM d ORDER BY doc_id""".stripMargin
    },
    "tfsequence_parse" -> {
      // SequenceExample: context map + two word-aligned feature_lists;
      // words_md5 re-joins the decoded steps so list ORDER must be
      // preserved end-to-end through the map-entry/FeatureList walk
      """WITH d AS (
        |  SELECT doc_id, text, lang FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0),
        |t AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
        |  FROM d)
        |SELECT doc_id, doc_id // 8 AS shard_id,
        |  row_number() OVER (PARTITION BY doc_id // 8 ORDER BY doc_id)
        |    - 1 AS pos,
        |  lang, CAST(3 AS INT) AS n_ctx,
        |  CAST(len(ws) AS BIGINT) AS n_steps,
        |  md5(array_to_string(ws, ' ')) AS words_md5,
        |  CAST(coalesce(list_sum(list_transform(ws,
        |    w -> CAST(strlen(w) AS BIGINT))), 0) AS BIGINT) AS len_sum,
        |  CAST(coalesce(list_sum(list_transform(ws,
        |    w -> CAST(strlen(w) % 7 AS BIGINT))), 0) AS BIGINT)
        |    AS mod_sum
        |FROM t ORDER BY doc_id""".stripMargin
    },
    // arrow-java writes, our flatbuffer walker reads; facts from
    // DECODED values only (no codec column — Arrow IPC is uncoded)
    "arrow_ipc_parse" -> arrowIpcOracleSql,
    // same facts through the written .arrow fixture tree + binaryFile
    "arrow_ipc_files" -> arrowIpcOracleSql,
    // same facts through ZSTD body compression — the compression
    // envelope must be invisible to every decoded value
    "arrow_ipc_compressed" -> arrowIpcOracleSql,
    // same facts through the user-facing DataFrame sources: typed
    // columns derived with plain SQL, the source layer transparent
    "arrow_source_read" -> arrowIpcOracleSql,
    // sink→source round trip incl. a NESTED token-length array:
    // the whole write-read stack must be value-transparent
    "arrow_sink_roundtrip" -> sinkRoundtripOracleSql,
    // date32 / timestamp[us] / duration[ms] surfaced as raw counts —
    // pins the .fbs default-unit vtable omission among other things
    "arrow_ipc_temporal" ->
      """WITH d AS (
        |  SELECT doc_id, strlen(text) AS n FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id, doc_id // 8 AS shard_id,
        |  CAST(19000 + doc_id % 1000 AS INT) AS day,
        |  CASE WHEN doc_id % 7 = 3 THEN NULL
        |    ELSE 1700000000000000 + doc_id * 1000003 END AS ts_us,
        |  n * 250 AS dur_ms
        |FROM d ORDER BY doc_id""".stripMargin,
    // fixed_size_list<float32,64> + LargeUtf8 over the REAL
    // embeddings table: every float32 lane surfaces through the
    // repo's round(x·1000) quantization convention
    "arrow_ipc_embeddings" ->
      """WITH q AS (
        |  SELECT vec_id, label, len(embedding) AS dim,
        |    CAST(coalesce(list_sum(list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))),
        |      0) AS BIGINT) AS s
        |  FROM embeddings)
        |SELECT vec_id, vec_id // 8 AS shard_id,
        |  CASE WHEN vec_id % 13 = 9 THEN NULL
        |    ELSE CAST(dim AS INT) END AS dim,
        |  CASE WHEN vec_id % 13 = 9 THEN NULL ELSE s END AS emb_q,
        |  CASE WHEN vec_id % 11 = 10 THEN NULL
        |    ELSE 'cls-' || label END AS label
        |FROM q ORDER BY vec_id""".stripMargin,
    // OUR safetensors encoder + parser over the REAL embeddings
    // table: every F32 lane surfaces through the repo's
    // round(x·1000) quantization; ids/labels via I64/I32 tensors
    "safetensors_parse" ->
      """WITH q AS (
        |  SELECT vec_id, label, len(embedding) AS dim,
        |    CAST(coalesce(list_sum(list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))),
        |      0) AS BIGINT) AS s
        |  FROM embeddings)
        |SELECT vec_id, vec_id // 8 AS shard_id,
        |  CAST(dim AS INT) AS dim, s AS emb_q,
        |  CAST(label AS INT) AS label
        |FROM q ORDER BY vec_id""".stripMargin,
    // sink→source round trip of the user-facing tensor-shard API:
    // TensorSink writes a .safetensors tree, TensorSource reads it
    // back typed, facts via plain SQL (no shard column — shard
    // membership is partitioning-dependent)
    "tensor_source_read" -> embVectorOracleSql,
    // the same per-vector truth reassembled from a THREE-ARRAY zarr
    // v2 store (per-array compressor/order/endian rotation; edge
    // chunks padded) — chunk grid decode must be value-transparent
    "zarr_read" -> embVectorOracleSql,
    "zarr3_read" -> embVectorOracleSql,
    // ...and from ONNX ModelProto initializers, storage path
    // rotating raw_data/typed-packed by shard parity; graph facts
    // (shard id, MatMul→Relu ops) ride along
    "onnx_parse" ->
      """WITH q AS (
        |  SELECT vec_id, label, len(embedding) AS dim,
        |    CAST(coalesce(list_sum(list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))),
        |      0) AS BIGINT) AS s
        |  FROM embeddings)
        |SELECT vec_id, vec_id // 8 AS shard_id,
        |  CAST(dim AS INT) AS dim, s AS emb_q,
        |  CAST(label AS INT) AS label,
        |  'MatMul,Relu' AS ops,
        |  CASE WHEN (vec_id // 8) % 2 = 0 THEN 'E4M3FNUZ'
        |    ELSE 'E5M2FNUZ' END AS f8tag
        |FROM q ORDER BY vec_id""".stripMargin,
    // OUR .npy writer + parser, layout combos (C/Fortran × LE/BE)
    // rotating by shard id; order flags surface from the PARSED
    // header and are predicted analytically
    // structured recarray: every field kind (i8/u4/f8/S/U) decoded
    // from OUR packed layout; strings NUL-stripped per numpy
    "npy_structured" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id, strlen(text) AS text_len,
        |  strlen(text) * 0.25 AS score,
        |  't' || (doc_id % 100) AS tag,
        |  'm' || (doc_id % 7) AS mark,
        |  strlen(text) * 2 AS len2,
        |  strlen(text) % 7 AS len_mod7,
        |  doc_id % 11 AS rng_lo,
        |  doc_id % 13 AS rng_hi
        |FROM d ORDER BY doc_id""".stripMargin,
    "npy_parse" ->
      """WITH q AS (
        |  SELECT vec_id, len(embedding) AS dim,
        |    CAST(coalesce(list_sum(list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))),
        |      0) AS BIGINT) AS s
        |  FROM embeddings)
        |SELECT vec_id, vec_id // 8 AS shard_id,
        |  CAST(dim AS INT) AS dim, s AS emb_q,
        |  (vec_id // 8) % 4 >= 2 AS fortran,
        |  (vec_id // 8) % 2 = 1 AS big_endian
        |FROM q ORDER BY vec_id""".stripMargin,
    // HDF5 classic machinery: all three data layouts live
    // (deflate-chunked with edge clipping, contiguous, compact);
    // the _files twin reads the same shards as REAL .h5 files
    "hdf5_parse_files" -> hdf5OracleSqlShared,
    "hdf5_parse" -> hdf5OracleSqlShared,
    // the extensible-array growth lane: secondary blocks + paged
    // data blocks; facts recomputed from documents
    "hdf5_parse_deep" ->
      """SELECT doc_id, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,
    // six independent container paths (safetensors/GGUF/ONNX/HDF5
    // classic + latest/zarr-v3 sharded) must agree lane-for-lane
    // in-flight; the oracle pins the agreed facts
    "tensor_cross_check" ->
      """WITH q AS (
        |  SELECT vec_id, len(embedding) AS dim,
        |    CAST(coalesce(list_sum(list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))),
        |      0) AS BIGINT) AS s
        |  FROM embeddings)
        |SELECT vec_id, vec_id // 8 AS shard_id,
        |  CAST(dim AS INT) AS dim, s AS emb_q,
        |  CAST(6 AS INT) AS n_formats
        |FROM q ORDER BY vec_id""".stripMargin,
    // GGUF v3 (llama.cpp container): F32 lanes + the i32 label
    // metadata array + the per-shard rotated quant tags surface;
    // the Q8_0 twin, the rotated Q4_0/Q4_1/Q5_0/Q5_1 twin and the
    // rotated Q2_K…Q6_K twin (when the shard tiles 256-element
    // super-blocks) are bound-checked in-flight (closed-form block
    // quantizations, oracle-free)
    "gguf_parse" ->
      """WITH q AS (
        |  SELECT vec_id, label, len(embedding) AS dim,
        |    CAST(coalesce(list_sum(list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))),
        |      0) AS BIGINT) AS s,
        |    count(*) OVER (PARTITION BY vec_id // 8) AS shard_n
        |  FROM embeddings)
        |SELECT vec_id, vec_id // 8 AS shard_id,
        |  CAST(dim AS INT) AS dim, s AS emb_q,
        |  CAST(label AS INT) AS label, 'graft' AS arch,
        |  CASE CAST((vec_id // 8) % 4 AS INT)
        |    WHEN 0 THEN 'Q4_0' WHEN 1 THEN 'Q4_1'
        |    WHEN 2 THEN 'Q5_0' ELSE 'Q5_1' END AS qtag,
        |  CASE WHEN (shard_n * dim) % 256 <> 0 THEN 'none'
        |    ELSE CASE CAST((vec_id // 8) % 5 AS INT)
        |      WHEN 0 THEN 'Q2_K' WHEN 1 THEN 'Q3_K'
        |      WHEN 2 THEN 'Q4_K' WHEN 3 THEN 'Q5_K'
        |      ELSE 'Q6_K' END END AS qktag
        |FROM q ORDER BY vec_id""".stripMargin,
    // np.savez layout: ZIP members emb/vec_id/label, STORED on
    // even shards, DEFLATE on odd — the file layer must vanish
    "npz_parse" ->
      """WITH q AS (
        |  SELECT vec_id, label, len(embedding) AS dim,
        |    CAST(coalesce(list_sum(list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))),
        |      0) AS BIGINT) AS s
        |  FROM embeddings)
        |SELECT vec_id, vec_id // 8 AS shard_id,
        |  CAST(dim AS INT) AS dim, s AS emb_q,
        |  CAST(label AS INT) AS label
        |FROM q ORDER BY vec_id""".stripMargin,
    // dictionary-encoded label column resolved through OUR
    // DictionaryBatch decode (indices never surface)
    "arrow_ipc_dict" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id, doc_id // 8 AS shard_id,
        |  CASE WHEN doc_id % 11 = 10 THEN NULL
        |    ELSE 'label' || (doc_id % 4) END AS label
        |FROM d ORDER BY doc_id""".stripMargin,
    // nested columns (list<int64> tokens + struct meta): every fact
    // re-derived from OUR recursive decode of arrow-java output,
    // predicted here straight from documents
    "arrow_ipc_nested" ->
      """WITH d AS (
        |  SELECT doc_id, text, lang FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0),
        |t AS (
        |  SELECT doc_id, lang, strlen(text) AS meta_len,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
        |  FROM d)
        |SELECT doc_id, doc_id // 8 AS shard_id,
        |  CASE WHEN doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(len(ws) AS BIGINT) END AS n_tokens,
        |  CASE WHEN doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(coalesce(list_sum(list_transform(
        |      list_filter(ws, w -> strlen(w) % 5 <> 0),
        |      w -> CAST(strlen(w) AS BIGINT))), 0) AS BIGINT)
        |    END AS token_sum,
        |  CASE WHEN doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(len(list_filter(ws, w -> strlen(w) % 5 = 0))
        |      AS BIGINT) END AS null_tokens,
        |  CASE WHEN doc_id % 11 = 10 THEN NULL ELSE lang END AS lang,
        |  CAST(meta_len AS BIGINT) AS meta_len
        |FROM t ORDER BY doc_id""".stripMargin,
    // ...map<utf8,int64> word-length histograms + decimal(20,4)
    // the union column's two branches re-derived analytically —
    // runtime-type surfacing means a type-id/offset slip flips it
    "arrow_ipc_union" ->
      """SELECT doc_id, doc_id // 8 AS shard_id,
        |  CASE WHEN doc_id % 4 = 1 OR doc_id % 5 = 2 THEN NULL
        |    ELSE doc_id * 7 END AS u_i,
        |  CASE WHEN doc_id % 4 = 1 THEN doc_id * 0.25
        |    ELSE NULL END AS u_f
        |FROM documents
        |WHERE length(text) = strlen(text) AND length(text) > 0
        |ORDER BY doc_id""".stripMargin,
    // through OUR map/decimal decode; the oracle recomputes the
    // histogram facts and renders the decimal's exact plain string
    "arrow_ipc_map" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0),
        |t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
        |  FROM d),
        |h AS (
        |  SELECT doc_id, ws,
        |    list_distinct(list_transform(ws, w -> strlen(w))) AS lens
        |  FROM t)
        |SELECT doc_id, doc_id // 8 AS shard_id,
        |  CASE WHEN doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(len(lens) AS BIGINT) END AS m_size,
        |  CASE WHEN doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(coalesce(len(list_filter(ws,
        |      w -> strlen(w) % 7 <> 0)), 0) AS BIGINT) END AS v_sum,
        |  CASE WHEN doc_id % 13 = 9 THEN NULL
        |    ELSE CAST(coalesce(len(list_filter(lens,
        |      l -> l % 7 = 0)), 0) AS BIGINT) END AS n_nullv,
        |  CASE WHEN doc_id % 13 = 9 OR len(lens) = 0 THEN NULL
        |    ELSE CAST(list_max(lens) AS BIGINT) END AS k_max,
        |  CASE WHEN doc_id % 11 = 10 THEN NULL
        |    ELSE printf('%d.%04d',
        |      (doc_id * 137 + 41) % 1000003 // 10000,
        |      (doc_id * 137 + 41) % 1000003 % 10000) END AS price_s
        |FROM h ORDER BY doc_id""".stripMargin,
    "tfrecord_parse_files" -> {
      // no names in the format and no build-side doc list available to
      // the FILE walk, so identity is (shard, pos) — rank within the
      // 8-doc shard
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE length(text) = strlen(text) AND length(text) > 0)
        |SELECT doc_id // 8 AS shard_id,
        |  row_number() OVER (PARTITION BY doc_id // 8 ORDER BY doc_id)
        |    - 1 AS pos,
        |  strlen(text) AS length, md5(text) AS md5
        |FROM d ORDER BY shard_id, pos""".stripMargin
    }
  )
}
