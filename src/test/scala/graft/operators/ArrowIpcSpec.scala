package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Arrow IPC pins: differentials against the arrow-java 18.3
  * implementation Spark bundles — ArrowFileWriter and
  * ArrowStreamWriter output across every supported column type, with
  * nulls, across multiple batches, read back value-exact by our
  * from-scratch flatbuffer walker; nested-type and dictionary
  * rejection; magic/truncation/garbage fuzz. */
class ArrowIpcSpec extends AnyFunSuite {

  import org.apache.arrow.memory.RootAllocator
  import org.apache.arrow.vector._
  import org.apache.arrow.vector.ipc.{ArrowFileWriter, ArrowStreamWriter}
  import org.apache.arrow.vector.types.pojo.{Schema => ASchema}
  import scala.jdk.CollectionConverters._

  private val N = 37 // odd, crosses byte boundaries in bitmaps

  /** Build a VectorSchemaRoot with every supported type; null where
    * i % 7 == 3 (on the nullable columns). */
  private def fill(root: VectorSchemaRoot, batch: Int): Unit = {
    val n = N
    root.allocateNew()
    val ids = root.getVector("id").asInstanceOf[BigIntVector]
    val i32 = root.getVector("i32").asInstanceOf[IntVector]
    val i16 = root.getVector("i16").asInstanceOf[SmallIntVector]
    val i8 = root.getVector("i8").asInstanceOf[TinyIntVector]
    val u64 = root.getVector("u64").asInstanceOf[UInt8Vector]
    val f32 = root.getVector("f32").asInstanceOf[Float4Vector]
    val f64 = root.getVector("f64").asInstanceOf[Float8Vector]
    val bit = root.getVector("flag").asInstanceOf[BitVector]
    val txt = root.getVector("text").asInstanceOf[VarCharVector]
    val bin = root.getVector("blob").asInstanceOf[VarBinaryVector]
    for (i <- 0 until n) {
      val k = batch * 1000 + i
      ids.setSafe(i, k.toLong * 1000003L)
      i32.setSafe(i, k - 500)
      i16.setSafe(i, (k % 30000).toShort)
      i8.setSafe(i, (k % 100).toByte)
      u64.setSafe(i, -1L + k) // exercises the unsigned-as-raw contract
      if (i % 7 == 3) f32.setNull(i) else f32.setSafe(i, k / 3f)
      f64.setSafe(i, k * 0.25 - 3.0)
      bit.setSafe(i, if (k % 3 == 0) 1 else 0)
      if (i % 7 == 3) txt.setNull(i)
      else txt.setSafe(i, s"doc-$k-${"x" * (i % 5)}".getBytes("UTF-8"))
      bin.setSafe(i, Array.tabulate[Byte](i % 6)(j => (k + j).toByte))
    }
    root.setRowCount(n)
  }

  private def mkSchema(alloc: RootAllocator): VectorSchemaRoot = {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    import org.apache.arrow.vector.types.FloatingPointPrecision
    def f(name: String, t: ArrowType, nullable: Boolean) =
      new Field(name, new FieldType(nullable, t, null), null)
    val schema = new ASchema(Seq(
      f("id", new ArrowType.Int(64, true), nullable = false),
      f("i32", new ArrowType.Int(32, true), nullable = false),
      f("i16", new ArrowType.Int(16, true), nullable = false),
      f("i8", new ArrowType.Int(8, true), nullable = false),
      f("u64", new ArrowType.Int(64, false), nullable = false),
      f("f32", new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE),
        nullable = true),
      f("f64", new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE),
        nullable = false),
      f("flag", ArrowType.Bool.INSTANCE, nullable = false),
      f("text", ArrowType.Utf8.INSTANCE, nullable = true),
      f("blob", ArrowType.Binary.INSTANCE, nullable = false)).asJava)
    VectorSchemaRoot.create(schema, alloc)
  }

  private def checkRows(cols: Seq[ArrowIpc.Col],
      rows: Seq[ArrowIpc.Row], batches: Int): Unit = {
    assert(cols.map(_.tag) == Seq("int64", "int32", "int16", "int8",
      "uint64", "float32", "float64", "bool", "utf8", "binary"))
    assert(cols.map(_.name) == Seq("id", "i32", "i16", "i8", "u64",
      "f32", "f64", "flag", "text", "blob"))
    assert(rows.length == batches * N)
    for (b <- 0 until batches; i <- 0 until N) {
      val k = b * 1000 + i
      val r = rows(b * N + i)
      assert(r(0) == Some(k.toLong * 1000003L))
      assert(r(1) == Some(k - 500))
      assert(r(2) == Some((k % 30000).toShort))
      assert(r(3) == Some((k % 100).toByte))
      assert(r(4) == Some(-1L + k))
      if (i % 7 == 3) assert(r(5).isEmpty)
      else assert(r(5) == Some(k / 3f))
      assert(r(6) == Some(k * 0.25 - 3.0))
      assert(r(7) == Some(k % 3 == 0))
      if (i % 7 == 3) assert(r(8).isEmpty)
      else assert(r(8) == Some(s"doc-$k-${"x" * (i % 5)}"))
      assert(r(9).get.asInstanceOf[Array[Byte]].sameElements(
        Array.tabulate[Byte](i % 6)(j => (k + j).toByte)))
    }
  }

  test("differential: ArrowFileWriter -> our file reader (2 batches)") {
    val alloc = new RootAllocator()
    val root = mkSchema(alloc)
    val buf = new java.io.ByteArrayOutputStream()
    val w = new ArrowFileWriter(root, null,
      java.nio.channels.Channels.newChannel(buf))
    w.start()
    fill(root, 0); w.writeBatch()
    fill(root, 1); w.writeBatch()
    w.end(); w.close(); root.close(); alloc.close()
    val bytes = buf.toByteArray
    assert(ArrowIpc.isArrowFile(bytes))
    val (cols, rows) = ArrowIpc.parseFile(bytes).get
    checkRows(cols, rows, batches = 2)
  }

  test("differential: ArrowStreamWriter -> our stream reader") {
    val alloc = new RootAllocator()
    val root = mkSchema(alloc)
    val buf = new java.io.ByteArrayOutputStream()
    val w = new ArrowStreamWriter(root, null,
      java.nio.channels.Channels.newChannel(buf))
    w.start()
    fill(root, 0); w.writeBatch()
    w.end(); w.close(); root.close(); alloc.close()
    val (cols, rows) = ArrowIpc.parseStream(buf.toByteArray).get
    checkRows(cols, rows, batches = 1)
  }

  private def writeFile(root: VectorSchemaRoot): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val w = new ArrowFileWriter(root, null,
      java.nio.channels.Channels.newChannel(buf))
    w.start(); w.writeBatch(); w.end(); w.close()
    buf.toByteArray
  }

  test("differential: list<int64> with null lists and null elements") {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    import org.apache.arrow.vector.complex.ListVector
    val alloc = new RootAllocator()
    val item = new Field("item",
      new FieldType(true, new ArrowType.Int(64, true), null), null)
    val schema = new ASchema(Seq(
      new Field("id", new FieldType(false, new ArrowType.Int(64, true),
        null), null),
      new Field("xs", new FieldType(true, ArrowType.List.INSTANCE, null),
        Seq(item).asJava)).asJava)
    val root = VectorSchemaRoot.create(schema, alloc)
    root.allocateNew()
    val ids = root.getVector("id").asInstanceOf[BigIntVector]
    val xs = root.getVector("xs").asInstanceOf[ListVector]
    val data = xs.getDataVector.asInstanceOf[BigIntVector]
    val n = 41 // crosses bitmap byte boundaries
    var off = 0
    for (i <- 0 until n) {
      ids.setSafe(i, i * 7L)
      if (i % 9 == 4) xs.setNull(i)
      else {
        xs.startNewValue(i)
        val len = i % 5
        for (j <- 0 until len) {
          if ((i + j) % 6 == 5) data.setNull(off + j)
          else data.setSafe(off + j, i * 100L + j)
        }
        xs.endValue(i, len)
        off += len
      }
    }
    root.setRowCount(n)
    val bytes = writeFile(root)
    root.close(); alloc.close()
    val (cols, rows) = ArrowIpc.parseFile(bytes).get
    assert(cols == Seq(
      ArrowIpc.Col("id", nullable = false, "int64"),
      ArrowIpc.Col("xs", nullable = true, "list",
        Seq(ArrowIpc.Col("item", nullable = true, "int64")))))
    assert(rows.length == n)
    for (i <- 0 until n) {
      assert(rows(i)(0) == Some(i * 7L))
      if (i % 9 == 4) assert(rows(i)(1).isEmpty)
      else {
        val got = rows(i)(1).get.asInstanceOf[Seq[Option[Any]]]
        val want = (0 until i % 5).map(j =>
          if ((i + j) % 6 == 5) None else Some(i * 100L + j))
        assert(got == want, s"row $i: $got != $want")
      }
    }
  }

  test("differential: struct column with nulls at both levels") {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    import org.apache.arrow.vector.complex.StructVector
    val alloc = new RootAllocator()
    val schema = new ASchema(Seq(
      new Field("meta", new FieldType(true, ArrowType.Struct.INSTANCE,
        null), Seq(
        new Field("a", new FieldType(false, new ArrowType.Int(64, true),
          null), null),
        new Field("b", new FieldType(true, ArrowType.Utf8.INSTANCE,
          null), null)).asJava)).asJava)
    val root = VectorSchemaRoot.create(schema, alloc)
    root.allocateNew()
    val sv = root.getVector("meta").asInstanceOf[StructVector]
    val a = sv.getChild("a").asInstanceOf[BigIntVector]
    val b = sv.getChild("b").asInstanceOf[VarCharVector]
    val n = 29
    for (i <- 0 until n) {
      if (i % 8 == 2) sv.setNull(i)
      else {
        sv.setIndexDefined(i)
        a.setSafe(i, i * 31L)
        if (i % 4 == 1) b.setNull(i)
        else b.setSafe(i, s"s$i".getBytes("UTF-8"))
      }
    }
    root.setRowCount(n)
    val bytes = writeFile(root)
    root.close(); alloc.close()
    val (cols, rows) = ArrowIpc.parseFile(bytes).get
    assert(cols.head.tag == "struct" &&
      cols.head.children.map(_.tag) == Seq("int64", "utf8"))
    for (i <- 0 until n) {
      if (i % 8 == 2) assert(rows(i)(0).isEmpty)
      else {
        val st = rows(i)(0).get.asInstanceOf[Seq[Option[Any]]]
        assert(st(0) == Some(i * 31L))
        if (i % 4 == 1) assert(st(1).isEmpty)
        else assert(st(1) == Some(s"s$i"))
      }
    }
  }

  test("differential: list<utf8> and two-level list<list<int64>>") {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    import org.apache.arrow.vector.complex.ListVector
    val alloc = new RootAllocator()
    val inner = new Field("item",
      new FieldType(true, new ArrowType.Int(64, true), null), null)
    val innerList = new Field("item",
      new FieldType(true, ArrowType.List.INSTANCE, null),
      Seq(inner).asJava)
    val schema = new ASchema(Seq(
      new Field("ws", new FieldType(false, ArrowType.List.INSTANCE, null),
        Seq(new Field("item", new FieldType(false,
          ArrowType.Utf8.INSTANCE, null), null)).asJava),
      new Field("nest", new FieldType(true, ArrowType.List.INSTANCE,
        null), Seq(innerList).asJava)).asJava)
    val root = VectorSchemaRoot.create(schema, alloc)
    root.allocateNew()
    val ws = root.getVector("ws").asInstanceOf[ListVector]
    val wsData = ws.getDataVector.asInstanceOf[VarCharVector]
    val nest = root.getVector("nest").asInstanceOf[ListVector]
    val mid = nest.getDataVector.asInstanceOf[ListVector]
    val leaf = mid.getDataVector.asInstanceOf[BigIntVector]
    val n = 17
    var wOff = 0
    var mOff = 0
    var lOff = 0
    for (i <- 0 until n) {
      ws.startNewValue(i)
      val wn = i % 3
      for (j <- 0 until wn)
        wsData.setSafe(wOff + j, s"w$i-$j".getBytes("UTF-8"))
      ws.endValue(i, wn)
      wOff += wn
      nest.startNewValue(i)
      val mn = i % 2 + 1
      for (j <- 0 until mn) {
        mid.startNewValue(mOff + j)
        val ln = (i + j) % 3
        for (k <- 0 until ln) leaf.setSafe(lOff + k, i * 100L + j * 10 + k)
        mid.endValue(mOff + j, ln)
        lOff += ln
      }
      nest.endValue(i, mn)
      mOff += mn
    }
    root.setRowCount(n)
    val bytes = writeFile(root)
    root.close(); alloc.close()
    val (cols, rows) = ArrowIpc.parseFile(bytes).get
    assert(cols(0).tag == "list" && cols(0).children.head.tag == "utf8")
    assert(cols(1).tag == "list" &&
      cols(1).children.head.tag == "list" &&
      cols(1).children.head.children.head.tag == "int64")
    for (i <- 0 until n) {
      val got = rows(i)(0).get.asInstanceOf[Seq[Option[Any]]]
      assert(got == (0 until i % 3).map(j => Some(s"w$i-$j")))
      val nm = rows(i)(1).get.asInstanceOf[Seq[Option[Any]]]
      assert(nm.length == i % 2 + 1)
      for (j <- nm.indices) {
        val lv = nm(j).get.asInstanceOf[Seq[Option[Any]]]
        assert(lv == (0 until (i + j) % 3).map(k =>
          Some(i * 100L + j * 10 + k)))
      }
    }
  }

  test("differential: dictionary-encoded utf8 column (arrow-java)") {
    import org.apache.arrow.vector.types.pojo.{ArrowType, DictionaryEncoding,
      Field, FieldType}
    import org.apache.arrow.vector.dictionary.{Dictionary,
      DictionaryEncoder, DictionaryProvider}
    val alloc = new RootAllocator()
    // dictionary values: 4 labels
    val dictVec = new VarCharVector("dictv", alloc)
    dictVec.allocateNew()
    val labels = Seq("alpha", "beta", "gamma", "delta")
    labels.zipWithIndex.foreach { case (s, i) =>
      dictVec.setSafe(i, s.getBytes("UTF-8")) }
    dictVec.setValueCount(labels.length)
    val enc = new DictionaryEncoding(7L, false,
      new ArrowType.Int(32, true))
    val dictionary = new Dictionary(dictVec, enc)
    val provider = new DictionaryProvider.MapDictionaryProvider(dictionary)
    // unencoded column with nulls, then encode to indices
    val raw = new VarCharVector(
      new Field("label", new FieldType(true, ArrowType.Utf8.INSTANCE,
        null), null), alloc)
    raw.allocateNew()
    val n = 33
    for (i <- 0 until n) {
      if (i % 7 == 5) raw.setNull(i)
      else raw.setSafe(i, labels(i % 4).getBytes("UTF-8"))
    }
    raw.setValueCount(n)
    val encoded = DictionaryEncoder.encode(raw, dictionary)
      .asInstanceOf[IntVector]
    val ids = new BigIntVector("id", alloc)
    ids.allocateNew()
    for (i <- 0 until n) ids.setSafe(i, i * 3L)
    ids.setValueCount(n)
    val root = new VectorSchemaRoot(
      java.util.Arrays.asList(ids.getField, encoded.getField),
      java.util.Arrays.asList(ids, encoded), n)
    val buf = new java.io.ByteArrayOutputStream()
    val w = new ArrowFileWriter(root, provider,
      java.nio.channels.Channels.newChannel(buf))
    w.start(); w.writeBatch(); w.end(); w.close()
    root.close(); raw.close(); dictVec.close(); alloc.close()
    val (cols, rows) = ArrowIpc.parseFile(buf.toByteArray)
      .getOrElse(fail("dictionary-encoded file rejected"))
    assert(cols(1).tag == "utf8" && cols(1).dict.isDefined)
    assert(cols(1).dict.get._1 == 7L)
    assert(rows.length == n)
    for (i <- 0 until n) {
      assert(rows(i)(0) == Some(i * 3L))
      if (i % 7 == 5) assert(rows(i)(1).isEmpty)
      else assert(rows(i)(1) == Some(labels(i % 4)), s"row $i")
    }
  }

  test("differential: DELTA dictionary batches append to the base " +
    "(hand-serialized stream, arrow-java reader agrees) (late r14)") {
    import org.apache.arrow.vector.types.pojo.{ArrowType,
      DictionaryEncoding, Field, FieldType}
    import org.apache.arrow.vector.dictionary.{Dictionary,
      DictionaryProvider}
    import org.apache.arrow.vector.ipc.message.{ArrowDictionaryBatch,
      MessageSerializer}
    import org.apache.arrow.vector.ipc.{ArrowStreamReader, WriteChannel}
    val alloc = new RootAllocator()
    val labels = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val enc = new DictionaryEncoding(7L, false,
      new ArrowType.Int(32, true))
    def dictBatchOf(ls: Seq[String], isDelta: Boolean)
        : (ArrowDictionaryBatch, VectorSchemaRoot) = {
      val v = new VarCharVector("dictv", alloc)
      v.allocateNew()
      ls.zipWithIndex.foreach { case (x, i) =>
        v.setSafe(i, x.getBytes("UTF-8")) }
      v.setValueCount(ls.length)
      val r = new VectorSchemaRoot(
        java.util.Arrays.asList(v.getField),
        java.util.Arrays.asList(v), ls.length)
      val rb = new VectorUnloader(r).getRecordBatch
      (new ArrowDictionaryBatch(7L, rb, isDelta), r)
    }
    // encoded index column (int32 into the COMBINED dictionary);
    // the WIRE schema carries the VALUE type + encoding (what
    // ArrowStreamWriter's DictionaryUtility conversion emits)
    val idxField = new Field("label",
      new FieldType(true, new ArrowType.Int(32, true), enc), null)
    val wireField = new Field("label",
      new FieldType(true, ArrowType.Utf8.INSTANCE, enc), null)
    val idx = new IntVector(idxField, alloc)
    idx.allocateNew()
    val n = 23
    for (i <- 0 until n) {
      if (i % 7 == 5) idx.setNull(i)
      else idx.setSafe(i, i % labels.length) // 3,4 need the DELTA
    }
    idx.setValueCount(n)
    val root = new VectorSchemaRoot(
      java.util.Arrays.asList(idxField),
      java.util.Arrays.asList[FieldVector](idx), n)
    val buf = new java.io.ByteArrayOutputStream()
    val ch = new WriteChannel(
      java.nio.channels.Channels.newChannel(buf))
    MessageSerializer.serialize(ch,
      new ASchema(java.util.Arrays.asList(wireField)))
    val (base, r1) = dictBatchOf(labels.take(3), isDelta = false)
    val (delta, r2) = dictBatchOf(labels.drop(3), isDelta = true)
    MessageSerializer.serialize(ch, base)
    MessageSerializer.serialize(ch, delta)
    locally {
      val rb = new VectorUnloader(root).getRecordBatch
      MessageSerializer.serialize(ch, rb)
      rb.close()
    }
    ch.writeIntLittleEndian(-1) // stream end marker
    ch.writeIntLittleEndian(0)
    base.close(); delta.close(); r1.close(); r2.close()
    val bytes = buf.toByteArray
    // arrow-java's own reader accepts the construction and resolves
    // the combined dictionary — the legality witness
    val rd = new ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    assert(rd.loadNextBatch())
    val jr = rd.getVectorSchemaRoot
    val dictVals = rd.getDictionaryVectors.get(7L).getVector
      .asInstanceOf[VarCharVector]
    assert(dictVals.getValueCount == labels.length)
    val jidx = jr.getVector("label").asInstanceOf[IntVector]
    val javaRows = (0 until n).map { i =>
      if (jidx.isNull(i)) None
      else Some(new String(dictVals.get(jidx.get(i)), "UTF-8"))
    }
    rd.close()
    // our reader: same rows
    val (cols, rows) = ArrowIpc.parseStream(bytes)
      .getOrElse(fail("delta-dictionary stream rejected"))
    assert(cols.head.dict.exists(_._1 == 7L))
    assert(rows.length == n)
    for (i <- 0 until n) {
      val want = if (i % 7 == 5) None else Some(labels(i % 5))
      assert(rows(i)(0) == want, s"row $i")
      assert(javaRows(i) == want, s"java row $i")
    }
    // a DELTA with no base is malformed: strip the base batch out
    // by re-serializing without it
    val buf2 = new java.io.ByteArrayOutputStream()
    val ch2 = new WriteChannel(
      java.nio.channels.Channels.newChannel(buf2))
    MessageSerializer.serialize(ch2,
      new ASchema(java.util.Arrays.asList(wireField)))
    val (orphan, r3) = dictBatchOf(labels.take(2), isDelta = true)
    MessageSerializer.serialize(ch2, orphan)
    locally {
      val rb = new VectorUnloader(root).getRecordBatch
      MessageSerializer.serialize(ch2, rb)
      rb.close()
    }
    ch2.writeIntLittleEndian(-1); ch2.writeIntLittleEndian(0)
    orphan.close(); r3.close()
    assert(ArrowIpc.parseStream(buf2.toByteArray).isEmpty,
      "orphan delta accepted")
    root.close(); idx.close(); alloc.close()
  }

  test("differential: dictionary with LIST<int64> value type " +
    "(hand-serialized, arrow-java reader agrees) (late r14)") {
    import org.apache.arrow.vector.types.pojo.{ArrowType,
      DictionaryEncoding, Field, FieldType}
    import org.apache.arrow.vector.complex.ListVector
    import org.apache.arrow.vector.ipc.message.{ArrowDictionaryBatch,
      MessageSerializer}
    import org.apache.arrow.vector.ipc.{ArrowStreamReader, WriteChannel}
    val alloc = new RootAllocator()
    val enc = new DictionaryEncoding(9L, false,
      new ArrowType.Int(32, true))
    // dictionary VALUES: 3 distinct token lists (one with a null)
    val dictLists: Seq[Seq[Option[Long]]] = Seq(
      Seq(Some(1L), Some(2L)),
      Seq(Some(10L), None, Some(30L)),
      Seq.empty)
    val lv = ListVector.empty("dictv", alloc)
    val w = lv.getWriter
    w.allocate()
    dictLists.zipWithIndex.foreach { case (xs, i) =>
      w.setPosition(i)
      w.startList()
      xs.foreach {
        case Some(v) => w.bigInt().writeBigInt(v)
        case None => w.bigInt().writeNull()
      }
      w.endList()
    }
    w.setValueCount(dictLists.length)
    val dictRoot = new VectorSchemaRoot(
      java.util.Arrays.asList(lv.getField),
      java.util.Arrays.asList[FieldVector](lv), dictLists.length)
    // wire schema: VALUE type (list<int64>) + the encoding
    val wireField = new Field("toks",
      new FieldType(true, ArrowType.List.INSTANCE, enc),
      java.util.Arrays.asList(new Field("item",
        FieldType.nullable(new ArrowType.Int(64, true)), null)))
    // index column: int32 into the dictionary, null every 7th
    val idxField = new Field("toks",
      new FieldType(true, new ArrowType.Int(32, true), enc), null)
    val idx = new IntVector(idxField, alloc)
    idx.allocateNew()
    val n = 19
    for (i <- 0 until n) {
      if (i % 7 == 5) idx.setNull(i)
      else idx.setSafe(i, i % dictLists.length)
    }
    idx.setValueCount(n)
    val root = new VectorSchemaRoot(
      java.util.Arrays.asList(idxField),
      java.util.Arrays.asList[FieldVector](idx), n)
    val buf = new java.io.ByteArrayOutputStream()
    val ch = new WriteChannel(
      java.nio.channels.Channels.newChannel(buf))
    MessageSerializer.serialize(ch,
      new ASchema(java.util.Arrays.asList(wireField)))
    locally {
      val rb = new VectorUnloader(dictRoot).getRecordBatch
      val db = new ArrowDictionaryBatch(9L, rb, false)
      MessageSerializer.serialize(ch, db)
      db.close()
    }
    locally {
      val rb = new VectorUnloader(root).getRecordBatch
      MessageSerializer.serialize(ch, rb)
      rb.close()
    }
    ch.writeIntLittleEndian(-1); ch.writeIntLittleEndian(0)
    dictRoot.close()
    val bytes = buf.toByteArray
    // arrow-java legality witness
    val rd = new ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    assert(rd.loadNextBatch())
    val dictVec = rd.getDictionaryVectors.get(9L).getVector
      .asInstanceOf[ListVector]
    assert(dictVec.getValueCount == dictLists.length)
    rd.close()
    // our reader
    val (cols, rows) = ArrowIpc.parseStream(bytes)
      .getOrElse(fail("nested-dictionary stream rejected"))
    assert(cols.head.tag == "list" && cols.head.dict.isDefined)
    assert(rows.length == n)
    for (i <- 0 until n) {
      val want: Option[Any] =
        if (i % 7 == 5) None
        else Some(dictLists(i % 3).map(
          _.map(_.asInstanceOf[Any])): Seq[Option[Any]])
      assert(rows(i)(0) == want, s"row $i: ${rows(i)(0)}")
    }
    root.close(); idx.close(); alloc.close()
  }

  test("two fields sharing a dictionary id at DIFFERENT value " +
    "types reject (late r14)") {
    import org.apache.arrow.vector.types.pojo.{ArrowType,
      DictionaryEncoding, Field, FieldType}
    import org.apache.arrow.vector.ipc.message.MessageSerializer
    import org.apache.arrow.vector.ipc.WriteChannel
    val enc = new DictionaryEncoding(1L, false,
      new ArrowType.Int(32, true))
    val fUtf8 = new Field("a",
      new FieldType(true, ArrowType.Utf8.INSTANCE, enc), null)
    val fList = new Field("b",
      new FieldType(true, ArrowType.List.INSTANCE, enc),
      java.util.Arrays.asList(new Field("item",
        FieldType.nullable(new ArrowType.Int(64, true)), null)))
    val buf = new java.io.ByteArrayOutputStream()
    val ch = new WriteChannel(
      java.nio.channels.Channels.newChannel(buf))
    MessageSerializer.serialize(ch,
      new ASchema(java.util.Arrays.asList(fUtf8, fList)))
    ch.writeIntLittleEndian(-1); ch.writeIntLittleEndian(0)
    // the schema alone must already reject — decoding column b
    // through a's utf8 dictionary would invent values
    assert(ArrowIpc.parseStream(buf.toByteArray).isEmpty,
      "conflicting dictionary ids accepted")
  }

  test("differential: SPARSE and DENSE union columns (arrow-java " +
    "writers) (late r14)") {
    import org.apache.arrow.vector.complex.{DenseUnionVector, UnionVector}
    import org.apache.arrow.vector.holders.{NullableBigIntHolder,
      NullableFloat8Holder}
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field,
      FieldType}
    import org.apache.arrow.vector.types.Types.MinorType
    val n = 29
    // --- sparse: UnionVector (arrow-java's sparse union) ---
    locally {
      val alloc = new RootAllocator()
      val uv = UnionVector.empty("u", alloc)
      uv.allocateNew()
      val hI = new NullableBigIntHolder
      val hF = new NullableFloat8Holder
      for (i <- 0 until n) {
        if (i % 3 == 0) {
          hI.isSet = if (i % 6 == 0) 1 else 0
          hI.value = i.toLong * 11
          uv.setType(i, MinorType.BIGINT)
          uv.setSafe(i, hI)
        } else {
          hF.isSet = 1
          hF.value = i * 0.5
          uv.setType(i, MinorType.FLOAT8)
          uv.setSafe(i, hF)
        }
      }
      uv.setValueCount(n)
      val ids = new BigIntVector("id", alloc)
      ids.allocateNew()
      for (i <- 0 until n) ids.setSafe(i, i.toLong)
      ids.setValueCount(n)
      val root = new VectorSchemaRoot(
        java.util.Arrays.asList(ids.getField, uv.getField),
        java.util.Arrays.asList[FieldVector](ids, uv), n)
      val buf = new java.io.ByteArrayOutputStream()
      val w = new ArrowFileWriter(root,
        new org.apache.arrow.vector.dictionary.DictionaryProvider
          .MapDictionaryProvider(),
        java.nio.channels.Channels.newChannel(buf))
      w.start(); w.writeBatch(); w.end(); w.close()
      root.close(); alloc.close()
      val (cols, rows) = ArrowIpc.parseFile(buf.toByteArray)
        .getOrElse(fail("sparse union file rejected"))
      assert(cols(1).tag == "union_sparse", cols(1).tag)
      assert(rows.length == n)
      for (i <- 0 until n) {
        val want: Option[Any] =
          if (i % 3 == 0) {
            if (i % 6 == 0) Some(i.toLong * 11) else None
          } else Some(i * 0.5)
        assert(rows(i)(1) == want, s"sparse row $i: ${rows(i)(1)}")
      }
    }
    // --- dense: DenseUnionVector ---
    locally {
      val alloc = new RootAllocator()
      val duv = DenseUnionVector.empty("u", alloc)
      val tidI = duv.registerNewTypeId(new Field("i64",
        FieldType.nullable(new ArrowType.Int(64, true)), null))
      val tidF = duv.registerNewTypeId(new Field("f64",
        FieldType.nullable(new ArrowType.FloatingPoint(
          org.apache.arrow.vector.types.FloatingPointPrecision
            .DOUBLE)), null))
      duv.allocateNew()
      val hI = new NullableBigIntHolder
      val hF = new NullableFloat8Holder
      for (i <- 0 until n) {
        if (i % 4 == 1) {
          hF.isSet = 1
          hF.value = i * 0.25
          duv.setTypeId(i, tidF)
          duv.setSafe(i, hF)
        } else {
          hI.isSet = if (i % 5 == 2) 0 else 1
          hI.value = i.toLong * 7
          duv.setTypeId(i, tidI)
          duv.setSafe(i, hI)
        }
      }
      duv.setValueCount(n)
      val root = new VectorSchemaRoot(
        java.util.Arrays.asList(duv.getField),
        java.util.Arrays.asList[FieldVector](duv), n)
      val buf = new java.io.ByteArrayOutputStream()
      val w = new ArrowFileWriter(root,
        new org.apache.arrow.vector.dictionary.DictionaryProvider
          .MapDictionaryProvider(),
        java.nio.channels.Channels.newChannel(buf))
      w.start(); w.writeBatch(); w.end(); w.close()
      root.close(); alloc.close()
      val (cols, rows) = ArrowIpc.parseFile(buf.toByteArray)
        .getOrElse(fail("dense union file rejected"))
      assert(cols(0).tag == "union_dense", cols(0).tag)
      assert(rows.length == n)
      for (i <- 0 until n) {
        val want: Option[Any] =
          if (i % 4 == 1) Some(i * 0.25)
          else if (i % 5 == 2) None
          else Some(i.toLong * 7)
        assert(rows(i)(0) == want, s"dense row $i: ${rows(i)(0)}")
      }
    }
  }

  test("differential: fixed_size_list<float32> and Large* types") {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    import org.apache.arrow.vector.types.FloatingPointPrecision
    import org.apache.arrow.vector.complex.{FixedSizeListVector,
      LargeListVector}
    val alloc = new RootAllocator()
    val schema = new ASchema(Seq(
      new Field("emb", new FieldType(true,
        new ArrowType.FixedSizeList(4), null),
        Seq(new Field("item", new FieldType(false,
          new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE),
          null), null)).asJava),
      new Field("lt", new FieldType(true,
        ArrowType.LargeUtf8.INSTANCE, null), null),
      new Field("ll", new FieldType(false,
        ArrowType.LargeList.INSTANCE, null),
        Seq(new Field("item", new FieldType(true,
          new ArrowType.Int(64, true), null), null)).asJava),
      new Field("fb", new FieldType(true,
        new ArrowType.FixedSizeBinary(6), null), null)).asJava)
    val root = VectorSchemaRoot.create(schema, alloc)
    root.allocateNew()
    val emb = root.getVector("emb").asInstanceOf[FixedSizeListVector]
    val embData = emb.getDataVector.asInstanceOf[Float4Vector]
    val lt = root.getVector("lt").asInstanceOf[LargeVarCharVector]
    val ll = root.getVector("ll").asInstanceOf[LargeListVector]
    val llData = ll.getDataVector.asInstanceOf[BigIntVector]
    val fbv = root.getVector("fb").asInstanceOf[FixedSizeBinaryVector]
    val n = 19
    var lOff = 0
    for (i <- 0 until n) {
      if (i % 4 == 1) fbv.setNull(i)
      else fbv.setSafe(i, Array.tabulate[Byte](6)(j => (i * 7 + j).toByte))
      if (i % 6 == 3) emb.setNull(i)
      else {
        emb.setNotNull(i)
        for (j <- 0 until 4) embData.setSafe(i * 4 + j, i * 10f + j)
      }
      if (i % 5 == 2) lt.setNull(i)
      else lt.setSafe(i, s"large-$i".getBytes("UTF-8"))
      ll.startNewValue(i)
      val cnt = i % 3
      for (j <- 0 until cnt) {
        if ((i + j) % 4 == 1) llData.setNull(lOff + j)
        else llData.setSafe(lOff + j, i * 100L + j)
      }
      ll.endValue(i, cnt)
      lOff += cnt
    }
    root.setRowCount(n)
    val bytes = writeFile(root)
    root.close(); alloc.close()
    val (cols, rows) = ArrowIpc.parseFile(bytes)
      .getOrElse(fail("fixed/large-typed file rejected"))
    assert(cols.map(_.tag) == Seq("fixed_list", "large_utf8",
      "large_list", "fixed_binary_6"))
    assert(cols(0).fixedSize == 4 &&
      cols(0).children.head.tag == "float32")
    for (i <- 0 until n) {
      if (i % 6 == 3) assert(rows(i)(0).isEmpty)
      else assert(rows(i)(0).get.asInstanceOf[Seq[Option[Any]]] ==
        (0 until 4).map(j => Some(i * 10f + j)))
      if (i % 5 == 2) assert(rows(i)(1).isEmpty)
      else assert(rows(i)(1) == Some(s"large-$i"))
      val got = rows(i)(2).get.asInstanceOf[Seq[Option[Any]]]
      assert(got == (0 until i % 3).map(j =>
        if ((i + j) % 4 == 1) None else Some(i * 100L + j)))
      if (i % 4 == 1) assert(rows(i)(3).isEmpty)
      else assert(rows(i)(3).get.asInstanceOf[Array[Byte]].sameElements(
        Array.tabulate[Byte](6)(j => (i * 7 + j).toByte)))
    }
  }

  test("differential: temporal columns decode as raw counts") {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    import org.apache.arrow.vector.types.{DateUnit, TimeUnit}
    val alloc = new RootAllocator()
    val schema = new ASchema(Seq(
      new Field("d32", new FieldType(false,
        new ArrowType.Date(DateUnit.DAY), null), null),
      new Field("ts", new FieldType(true,
        new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC"), null),
        null),
      new Field("tns", new FieldType(false,
        new ArrowType.Timestamp(TimeUnit.NANOSECOND, null), null), null),
      new Field("t64", new FieldType(false,
        new ArrowType.Time(TimeUnit.MICROSECOND, 64), null), null),
      new Field("dur", new FieldType(false,
        new ArrowType.Duration(TimeUnit.MILLISECOND), null), null))
      .asJava)
    val root = VectorSchemaRoot.create(schema, alloc)
    root.allocateNew()
    val d32 = root.getVector("d32").asInstanceOf[DateDayVector]
    val ts = root.getVector("ts").asInstanceOf[TimeStampMicroTZVector]
    val tns = root.getVector("tns").asInstanceOf[TimeStampNanoVector]
    val t64 = root.getVector("t64").asInstanceOf[TimeMicroVector]
    val dur = root.getVector("dur").asInstanceOf[DurationVector]
    val n = 23
    for (i <- 0 until n) {
      d32.setSafe(i, 19000 + i)
      if (i % 7 == 2) ts.setNull(i)
      else ts.setSafe(i, 1700000000000000L + i * 1000003L)
      tns.setSafe(i, 1700000000000000000L + i)
      t64.setSafe(i, 86399000000L - i)
      dur.setSafe(i, i * 250L)
    }
    root.setRowCount(n)
    val bytes = writeFile(root)
    root.close(); alloc.close()
    val (cols, rows) = ArrowIpc.parseFile(bytes)
      .getOrElse(fail("temporal-typed file rejected"))
    assert(cols.map(_.tag) == Seq("date32", "timestamp_us",
      "timestamp_ns", "time64_us", "duration_ms"))
    for (i <- 0 until n) {
      assert(rows(i)(0) == Some(19000 + i))
      if (i % 7 == 2) assert(rows(i)(1).isEmpty)
      else assert(rows(i)(1) == Some(1700000000000000L + i * 1000003L))
      assert(rows(i)(2) == Some(1700000000000000000L + i))
      assert(rows(i)(3) == Some(86399000000L - i))
      assert(rows(i)(4) == Some(i * 250L))
    }
  }

  test("differential: LZ4_FRAME and ZSTD compressed bodies") {
    import org.apache.arrow.compression.CommonsCompressionFactory
    import org.apache.arrow.vector.compression.CompressionUtil
    import org.apache.arrow.vector.ipc.message.IpcOption
    for (codec <- Seq(CompressionUtil.CodecType.LZ4_FRAME,
        CompressionUtil.CodecType.ZSTD)) {
      val alloc = new RootAllocator()
      val root = mkSchema(alloc)
      val buf = new java.io.ByteArrayOutputStream()
      val w = new ArrowFileWriter(root, null,
        java.nio.channels.Channels.newChannel(buf), null,
        IpcOption.DEFAULT, CommonsCompressionFactory.INSTANCE, codec)
      w.start()
      fill(root, 0); w.writeBatch()
      fill(root, 1); w.writeBatch()
      w.end(); w.close(); root.close(); alloc.close()
      val (cols, rows) = ArrowIpc.parseFile(buf.toByteArray)
        .getOrElse(fail(s"$codec-compressed file rejected"))
      checkRows(cols, rows, batches = 2)
    }
  }

  test("differential: map<utf8,int64> column (arrow-java)") {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    import org.apache.arrow.vector.complex.{MapVector, StructVector}
    val alloc = new RootAllocator()
    val entries = new Field(MapVector.DATA_VECTOR_NAME,
      new FieldType(false, ArrowType.Struct.INSTANCE, null), Seq(
        new Field(MapVector.KEY_NAME, new FieldType(false,
          ArrowType.Utf8.INSTANCE, null), null),
        new Field(MapVector.VALUE_NAME, new FieldType(true,
          new ArrowType.Int(64, true), null), null)).asJava)
    val mapF = new Field("m", new FieldType(true,
      new ArrowType.Map(false), null), Seq(entries).asJava)
    val schema = new ASchema(Seq(mapF).asJava)
    val root = VectorSchemaRoot.create(schema, alloc)
    root.allocateNew()
    val mv = root.getVector("m").asInstanceOf[MapVector]
    val ev = mv.getDataVector.asInstanceOf[StructVector]
    val keys = ev.getChild(MapVector.KEY_NAME)
      .asInstanceOf[VarCharVector]
    val vals = ev.getChild(MapVector.VALUE_NAME)
      .asInstanceOf[BigIntVector]
    // row 0: {a->1, b->null}; row 1: null map; row 2: {}; row 3: {c->-7}
    val data: Seq[Option[Seq[(String, Option[Long])]]] = Seq(
      Some(Seq("a" -> Some(1L), "b" -> None)), None, Some(Nil),
      Some(Seq("c" -> Some(-7L))))
    var off = 0
    data.zipWithIndex.foreach {
      case (None, i) => mv.setNull(i)
      case (Some(kvs), i) =>
        mv.startNewValue(i)
        kvs.foreach { case (k, v) =>
          ev.setIndexDefined(off)
          keys.setSafe(off, k.getBytes("UTF-8"))
          v match {
            case Some(x) => vals.setSafe(off, x)
            case None => vals.setNull(off)
          }
          off += 1
        }
        mv.endValue(i, kvs.length)
    }
    root.setRowCount(data.length)
    val bytes = writeFile(root)
    root.close(); alloc.close()
    val (cols, rows) = ArrowIpc.parseFile(bytes).get
    assert(cols.map(_.tag) == Seq("map"))
    assert(cols.head.children.head.children.map(_.tag) ==
      Seq("utf8", "int64"))
    def asMap(v: Option[Any]): Option[Seq[(String, Option[Long])]] =
      v.map(_.asInstanceOf[Seq[Option[Any]]].map { e =>
        val kv = e.get.asInstanceOf[Seq[Option[Any]]]
        (kv(0).get.asInstanceOf[String],
          kv(1).map(_.asInstanceOf[Long]))
      })
    assert(rows.map(r => asMap(r(0))) == data)
  }

  test("differential: decimal128 column (arrow-java)") {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    val alloc = new RootAllocator()
    val decF = new Field("d", new FieldType(true,
      new ArrowType.Decimal(20, 4, 128), null), null)
    val schema = new ASchema(Seq(decF).asJava)
    val root = VectorSchemaRoot.create(schema, alloc)
    root.allocateNew()
    val dv = root.getVector("d").asInstanceOf[DecimalVector]
    val values = Seq(
      Some(new java.math.BigDecimal("12345.6789")),
      None,
      Some(new java.math.BigDecimal("-0.0001")),
      Some(new java.math.BigDecimal("99999999999999.9999")),
      Some(java.math.BigDecimal.ZERO.setScale(4)))
    values.zipWithIndex.foreach {
      case (Some(x), i) => dv.setSafe(i, x)
      case (None, i) => dv.setNull(i)
    }
    root.setRowCount(values.length)
    val bytes = writeFile(root)
    root.close(); alloc.close()
    val (cols, rows) = ArrowIpc.parseFile(bytes).get
    assert(cols.map(_.tag) == Seq("decimal128_20_4"))
    assert(rows.map(_(0).map(_.asInstanceOf[java.math.BigDecimal]))
      == values)
  }

  test("map with a null key rejects (never trusted from flags)") {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    import org.apache.arrow.vector.complex.{MapVector, StructVector}
    val alloc = new RootAllocator()
    // the schema FLAG says non-nullable key (arrow-java enforces
    // that much) — but the wire bitmap can still carry a null; the
    // reader must check the bits, not the flag
    val entries = new Field(MapVector.DATA_VECTOR_NAME,
      new FieldType(false, ArrowType.Struct.INSTANCE, null), Seq(
        new Field(MapVector.KEY_NAME, new FieldType(false,
          ArrowType.Utf8.INSTANCE, null), null),
        new Field(MapVector.VALUE_NAME, new FieldType(true,
          new ArrowType.Int(64, true), null), null)).asJava)
    val mapF = new Field("m", new FieldType(true,
      new ArrowType.Map(false), null), Seq(entries).asJava)
    val schema = new ASchema(Seq(mapF).asJava)
    val root = VectorSchemaRoot.create(schema, alloc)
    root.allocateNew()
    val mv = root.getVector("m").asInstanceOf[MapVector]
    val ev = mv.getDataVector.asInstanceOf[StructVector]
    val vals = ev.getChild(MapVector.VALUE_NAME)
      .asInstanceOf[BigIntVector]
    mv.startNewValue(0)
    ev.setIndexDefined(0) // entry exists but its KEY is never set
    vals.setSafe(0, 5L)
    mv.endValue(0, 1)
    root.setRowCount(1)
    val bytes = writeFile(root)
    root.close(); alloc.close()
    assert(ArrowIpc.parseFile(bytes).isEmpty)
  }

  test("rejections: bad magic, truncation, garbage") {
    val alloc = new RootAllocator()
    val root = mkSchema(alloc)
    val buf = new java.io.ByteArrayOutputStream()
    val w = new ArrowFileWriter(root, null,
      java.nio.channels.Channels.newChannel(buf))
    w.start(); fill(root, 0); w.writeBatch(); w.end(); w.close()
    root.close(); alloc.close()
    val good = buf.toByteArray
    assert(ArrowIpc.parseFile("ARROW2XXXXXXXX".getBytes).isEmpty)
    assert(ArrowIpc.parseFile(good.dropRight(3)).isEmpty) // magic cut
    for (n <- Seq(8, 20, 100, good.length / 2))
      ArrowIpc.parseFile(good.take(n)) // must not throw
    val rnd = new scala.util.Random(0xa2206)
    for (_ <- 0 until 1500) {
      val junk = Array.fill(rnd.nextInt(96))(rnd.nextInt().toByte)
      ArrowIpc.parseFile(junk)
      ArrowIpc.parseStream(junk)
      ArrowIpc.parseFile("ARROW1  ".getBytes ++ junk ++
        "ARROW1".getBytes)
    }
  }

  test("mutation fuzz never throws, never changes the row contract") {
    val alloc = new RootAllocator()
    val root = mkSchema(alloc)
    val buf = new java.io.ByteArrayOutputStream()
    val w = new ArrowFileWriter(root, null,
      java.nio.channels.Channels.newChannel(buf))
    w.start(); fill(root, 0); w.writeBatch(); w.end(); w.close()
    root.close(); alloc.close()
    val good = buf.toByteArray
    val rnd = new scala.util.Random(31337)
    for (_ <- 0 until 1500) {
      val bad = good.clone()
      bad(rnd.nextInt(bad.length)) = rnd.nextInt().toByte
      ArrowIpc.parseFile(bad).foreach { case (cols, rows) =>
        assert(cols.length == 10)
        rows.foreach(r => assert(r.length == 10))
      }
    }
  }

  test("mutation fuzz over nested + dictionary + compressed fixtures") {
    import org.apache.arrow.compression.CommonsCompressionFactory
    import org.apache.arrow.vector.compression.CompressionUtil
    import org.apache.arrow.vector.ipc.message.IpcOption
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    import org.apache.arrow.vector.complex.{ListVector, StructVector}
    // fixture 1: nested list+struct; fixture 2: same but ZSTD-compressed
    def nestedBytes(codec: Option[CompressionUtil.CodecType])
        : Array[Byte] = {
      val alloc = new RootAllocator()
      val schema = new ASchema(Seq(
        new Field("xs", new FieldType(true, ArrowType.List.INSTANCE,
          null), Seq(new Field("item", new FieldType(true,
          new ArrowType.Int(64, true), null), null)).asJava),
        new Field("sub", new FieldType(false,
          ArrowType.Struct.INSTANCE, null), Seq(
          new Field("a", new FieldType(false,
            new ArrowType.Int(64, true), null), null),
          new Field("b", new FieldType(true, ArrowType.Utf8.INSTANCE,
            null), null)).asJava)).asJava)
      val root = VectorSchemaRoot.create(schema, alloc)
      root.allocateNew()
      val xs = root.getVector("xs").asInstanceOf[ListVector]
      val data = xs.getDataVector.asInstanceOf[BigIntVector]
      val sub = root.getVector("sub").asInstanceOf[StructVector]
      val a = sub.getChild("a").asInstanceOf[BigIntVector]
      val b = sub.getChild("b").asInstanceOf[VarCharVector]
      var off = 0
      for (i <- 0 until 21) {
        if (i % 5 == 4) xs.setNull(i)
        else {
          xs.startNewValue(i)
          for (k <- 0 until i % 4) data.setSafe(off + k, i * 10L + k)
          xs.endValue(i, i % 4)
          off += i % 4
        }
        sub.setIndexDefined(i)
        a.setSafe(i, i.toLong)
        b.setSafe(i, s"v$i".getBytes("UTF-8"))
      }
      root.setRowCount(21)
      val buf = new java.io.ByteArrayOutputStream()
      val w = codec match {
        case None => new ArrowFileWriter(root, null,
          java.nio.channels.Channels.newChannel(buf))
        case Some(c) => new ArrowFileWriter(root, null,
          java.nio.channels.Channels.newChannel(buf), null,
          IpcOption.DEFAULT, CommonsCompressionFactory.INSTANCE, c)
      }
      w.start(); w.writeBatch(); w.end(); w.close()
      root.close(); alloc.close()
      buf.toByteArray
    }
    val rnd = new scala.util.Random(0xfe57)
    for (good <- Seq(nestedBytes(None),
        nestedBytes(Some(CompressionUtil.CodecType.ZSTD)))) {
      assert(ArrowIpc.parseFile(good).isDefined)
      for (_ <- 0 until 1200) {
        val bad = good.clone()
        bad(rnd.nextInt(bad.length)) = rnd.nextInt().toByte
        // never throws; anything accepted keeps the column contract
        ArrowIpc.parseFile(bad).foreach { case (cols, rows) =>
          assert(cols.length == 2)
          rows.foreach(r => assert(r.length == 2))
        }
      }
    }
  }
}
