package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Avro container pins: exact round trips over every supported type
  * (nullable and not, both codecs, multi-block), FULL differentials
  * against the avro-1.12 implementation Spark bundles (their writer →
  * our reader; our writer → their reader; both codecs), schema-subset
  * rejection, sync-marker enforcement via mutation fuzz, and garbage
  * fuzz (parse never throws, never invents). */
class AvroSpec extends AnyFunSuite {

  import Avro.Field

  private val fields = Seq(
    Field("id", "long", nullable = false),
    Field("name", "string", nullable = false),
    Field("score", "double", nullable = false),
    Field("flag", "boolean", nullable = false),
    Field("rank", "int", nullable = false),
    Field("ratio", "float", nullable = false),
    Field("blob", "bytes", nullable = false),
    Field("label", "string", nullable = true))

  private def mkRows(n: Int): Seq[Avro.Row] =
    (0 until n).map { i =>
      Seq[Option[Any]](
        Some(i.toLong * 1000003L),
        Some(s"doc-$i-" + ("x" * (i % 7))),
        Some(i * 0.25 - 3.0),
        Some(i % 3 == 0),
        Some(i - 500),
        Some(i.toFloat / 3f),
        Some(Array.tabulate[Byte](i % 5)(j => (i + j).toByte)),
        if (i % 11 == 10) None else Some(s"label${i % 4}"))
    }

  private def assertRowsEqual(got: Seq[Avro.Row], want: Seq[Avro.Row]): Unit = {
    assert(got.length == want.length)
    for ((g, w) <- got.zip(want); ((gv, wv), k) <- g.zip(w).zipWithIndex)
      (gv, wv) match {
        case (Some(a: Array[Byte]), Some(b: Array[Byte])) =>
          assert(a.toSeq == b.toSeq, s"col $k")
        case _ => assert(gv == wv, s"col $k")
      }
  }

  test("round trips: both codecs, multi-block, empty") {
    for (codec <- Seq("null", "deflate"); n <- Seq(0, 1, 137, 2500)) {
      val rows = mkRows(n)
      val bytes = Avro.build("rec", fields, rows, codec, blockRows = 100)
      assert(Avro.isAvro(bytes))
      val got = Avro.parse(bytes)
      assert(got.isDefined, s"codec=$codec n=$n")
      assert(got.get.recordName == "rec")
      assert(got.get.fields == fields)
      assert(got.get.codec == codec)
      assert(got.get.blocks == (n + 99) / 100)
      assertRowsEqual(got.get.rows, rows)
    }
  }

  test("differential: avro-java reads our files, both codecs") {
    import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    for (codec <- Seq("null", "deflate")) {
      val rows = mkRows(300)
      val bytes = Avro.build("rec", fields, rows, codec, blockRows = 64)
      val rd = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(bytes),
        new GenericDatumReader[GenericRecord]())
      var i = 0
      while (rd.hasNext) {
        val rec = rd.next()
        assert(rec.get("id") == rows(i)(0).get, s"row $i")
        assert(rec.get("name").toString == rows(i)(1).get, s"row $i")
        assert(rec.get("score") == rows(i)(2).get, s"row $i")
        assert(rec.get("flag") == rows(i)(3).get, s"row $i")
        assert(rec.get("rank") == rows(i)(4).get, s"row $i")
        assert(rec.get("ratio") == rows(i)(5).get, s"row $i")
        val bb = rec.get("blob").asInstanceOf[java.nio.ByteBuffer]
        val got = new Array[Byte](bb.remaining()); bb.get(got)
        assert(got.toSeq ==
          rows(i)(6).get.asInstanceOf[Array[Byte]].toSeq, s"row $i")
        assert(Option(rec.get("label")).map(_.toString) ==
          rows(i)(7).map(_.toString), s"row $i")
        i += 1
      }
      rd.close()
      assert(i == 300)
    }
  }

  test("differential: we read avro-java files, both codecs") {
    import org.apache.avro.Schema
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new Schema.Parser()
      .parse(Avro.schemaJson("rec", fields))
    for (codec <- Seq("null", "deflate")) {
      val rows = mkRows(300)
      val bos = new java.io.ByteArrayOutputStream()
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      if (codec == "deflate") w.setCodec(CodecFactory.deflateCodec(6))
      w.create(schema, bos)
      for (r <- rows) {
        val rec = new GenericData.Record(schema)
        rec.put("id", r(0).get); rec.put("name", r(1).get)
        rec.put("score", r(2).get); rec.put("flag", r(3).get)
        rec.put("rank", r(4).get); rec.put("ratio", r(5).get)
        rec.put("blob",
          java.nio.ByteBuffer.wrap(r(6).get.asInstanceOf[Array[Byte]]))
        rec.put("label", r(7).orNull)
        w.append(rec)
      }
      w.close()
      val got = Avro.parse(bos.toByteArray)
      assert(got.isDefined, s"codec=$codec")
      assert(got.get.fields == fields)
      assert(got.get.codec == codec)
      assertRowsEqual(got.get.rows, rows)
    }
  }

  test("differential: all six spec codecs, both directions") {
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.file.{CodecFactory, DataFileReader,
      DataFileWriter, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericData, GenericDatumReader,
      GenericDatumWriter, GenericRecord}
    val schema = SchemaBuilder.record("c").fields()
      .name("id").`type`().longType().noDefault()
      .name("t").`type`().stringType().noDefault()
      .endRecord()
    val codecs = Seq(
      "null" -> CodecFactory.nullCodec(),
      "deflate" -> CodecFactory.deflateCodec(6),
      "bzip2" -> CodecFactory.bzip2Codec(),
      "snappy" -> CodecFactory.snappyCodec(),
      "xz" -> CodecFactory.xzCodec(6),
      "zstandard" -> CodecFactory.zstandardCodec(3))
    for ((name, cf) <- codecs) {
      // avro-java writes with the real codec → OUR decoder reads
      val bos = new java.io.ByteArrayOutputStream()
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.setCodec(cf)
      w.create(schema, bos)
      for (i <- 0 until 200) {
        val r = new GenericData.Record(schema)
        r.put("id", i.toLong)
        r.put("t", s"text-$i-" + ("pad" * (i % 9)))
        w.append(r)
      }
      w.close()
      val got = Avro.parse(bos.toByteArray)
      assert(got.isDefined, s"their $name output rejected")
      assert(got.get.codec == name && got.get.rows.length == 200)
      assert(got.get.rows(7)(1) == Some("text-7-" + ("pad" * 7)))
      // OUR writer with the same codec → avro-java reads it back
      val fields = Seq(Avro.Field("id", "long", nullable = false),
        Avro.Field("t", "string", nullable = false))
      val rows: Seq[Avro.Row] = (0 until 120).map(i =>
        Seq(Some(i.toLong), Some(s"r$i")))
      val ours = Avro.build("c", fields, rows, name, blockRows = 16)
      assert(Avro.parse(ours).exists(_.rows == rows), s"our $name")
      val rd = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(ours),
        new GenericDatumReader[GenericRecord]())
      var i = 0
      while (rd.hasNext) {
        val rec = rd.next()
        assert(rec.get("id") == i.toLong &&
          rec.get("t").toString == s"r$i")
        i += 1
      }
      rd.close()
      assert(i == 120, s"avro-java read ${i} rows of our $name file")
    }
    // snappy CRC is VERIFIED: flip one payload byte → reject
    val fields = Seq(Avro.Field("t", "string", nullable = false))
    val one = Avro.build("c", fields,
      Seq(Seq(Some("crc-pinned payload xxxxxxxx"))), "snappy")
    var rejected = 0
    for (p <- (one.length - 40) until (one.length - 20)) {
      val bad = one.clone()
      bad(p) = (bad(p) ^ 0x11).toByte
      if (Avro.parse(bad).isEmpty) rejected += 1
    }
    assert(rejected > 0, "no snappy corruption was rejected")
  }

  test("schema subset: complex types accept; unions/fixed/refs reject") {
    // r12: arrays, maps, enums and nested records now interpret
    val nested = """{"type":"record","name":"r","fields":[
      {"name":"x","type":{"type":"record","name":"q","fields":[]}}]}"""
    val arr = """{"type":"record","name":"r","fields":[
      {"name":"x","type":{"type":"array","items":"long"}}]}"""
    assert(Avro.interpretSchema(nested).contains(
      ("r", Seq(Avro.NField("x", Avro.NRec("q", Nil), nullable = false)))))
    assert(Avro.interpretSchema(arr).contains(
      ("r", Seq(Avro.NField("x",
        Avro.NArr(Avro.NPrim("long"), itemsNullable = false),
        nullable = false)))))
    // fixed accepts as of r12 (UUID/hash columns)
    val fixed = """{"type":"record","name":"r","fields":[
      {"name":"x","type":{"type":"fixed","name":"f","size":4}}]}"""
    assert(Avro.interpretSchema(fixed).contains(
      ("r", Seq(Avro.NField("x", Avro.NFixed("f", 4),
        nullable = false)))))
    // GENERAL unions interpret as of late r14 (positional branches)
    val tri = """{"type":"record","name":"r","fields":[
      {"name":"x","type":["null","long","string"]}]}"""
    assert(Avro.interpretSchema(tri).contains(
      ("r", Seq(Avro.NField("x", Avro.NUnion(Seq(None,
        Some(Avro.NPrim("long")), Some(Avro.NPrim("string")))),
        nullable = false)))))
    val valueFirst = """{"type":"record","name":"r","fields":[
      {"name":"x","type":["long","null"]}]}"""
    assert(Avro.interpretSchema(valueFirst).contains(
      ("r", Seq(Avro.NField("x", Avro.NUnion(Seq(
        Some(Avro.NPrim("long")), None)), nullable = false)))))
    // NAMED-TYPE references resolve as of late r14 (definition
    // order; the enum defined at field a is reusable at field b)
    val ref = """{"type":"record","name":"r","fields":[
      {"name":"a","type":{"type":"enum","name":"e","symbols":["s"]}},
      {"name":"b","type":"e"}]}"""
    assert(Avro.interpretSchema(ref).contains(
      ("r", Seq(
        Avro.NField("a", Avro.NEnum("e", Seq("s")), nullable = false),
        Avro.NField("b", Avro.NEnum("e", Seq("s")),
          nullable = false)))))
    // FORWARD and SELF references stay rejections (a name is only
    // visible after its definition completes)
    val fwd = """{"type":"record","name":"r","fields":[
      {"name":"b","type":"e"},
      {"name":"a","type":{"type":"enum","name":"e","symbols":["s"]}}]}"""
    val selfRec = """{"type":"record","name":"r","fields":[
      {"name":"x","type":{"type":"record","name":"n","fields":[
        {"name":"next","type":"n"}]}}]}"""
    // the permanent rejections: top-level non-record, absurd sizes
    val topArr = """["null","long"]"""
    val hugeFixed = """{"type":"record","name":"r","fields":[
      {"name":"x","type":{"type":"fixed","name":"f","size":99999999}}]}"""
    for (s <- Seq(topArr, fwd, selfRec, hugeFixed))
      assert(Avro.interpretSchema(s).isEmpty, s)
  }

  test("differential: named-type REUSE decodes (avro-java writes " +
    "one fixed + one enum used twice) (late r14)") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter,
      GenericRecord}
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"h1","type":{"type":"fixed","name":"h","size":4}},
        |  {"name":"h2","type":"h"},
        |  {"name":"e1","type":{"type":"enum","name":"lv",
        |    "symbols":["lo","mid","hi"]}},
        |  {"name":"e2","type":"lv"}
        |]}""".stripMargin)
    val buf = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, buf)
    val hs = schema.getField("h1").schema()
    val es = schema.getField("e1").schema()
    val n = 25
    for (i <- 0 until n) {
      val rec = new GenericData.Record(schema)
      rec.put("id", i.toLong)
      rec.put("h1", new GenericData.Fixed(hs,
        Array.tabulate[Byte](4)(j => (i + j).toByte)))
      rec.put("h2", new GenericData.Fixed(hs,
        Array.tabulate[Byte](4)(j => (i * 2 + j).toByte)))
      rec.put("e1", new GenericData.EnumSymbol(es,
        Seq("lo", "mid", "hi")(i % 3)))
      rec.put("e2", new GenericData.EnumSymbol(es,
        Seq("lo", "mid", "hi")((i + 1) % 3)))
      w.append(rec)
    }
    w.close()
    val f = Avro.parse(buf.toByteArray)
      .getOrElse(fail("named-reuse file rejected"))
    assert(f.fields.map(_.tpe) ==
      Seq("long", "fixed", "fixed", "enum", "enum"))
    for (i <- 0 until n) {
      val r = f.rows(i)
      assert(r(0) == Some(i.toLong))
      assert(r(1).get.asInstanceOf[Array[Byte]].toSeq ==
        Array.tabulate[Byte](4)(j => (i + j).toByte).toSeq)
      assert(r(2).get.asInstanceOf[Array[Byte]].toSeq ==
        Array.tabulate[Byte](4)(j => (i * 2 + j).toByte).toSeq)
      assert(r(3) == Some(Seq("lo", "mid", "hi")(i % 3)))
      assert(r(4) == Some(Seq("lo", "mid", "hi")((i + 1) % 3)))
    }
  }

  test("differential: GENERAL unions decode (avro-java writes) " +
    "(late r14)") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter,
      GenericRecord}
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"u","type":["long","string","null"]},
        |  {"name":"v","type":["boolean","double"]},
        |  {"name":"arr","type":{"type":"array",
        |    "items":["double","null","long"]}}
        |]}""".stripMargin)
    val buf = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, buf)
    val n = 40
    for (i <- 0 until n) {
      val rec = new GenericData.Record(schema)
      rec.put("id", i.toLong)
      rec.put("u",
        if (i % 3 == 0) java.lang.Long.valueOf(i * 5L)
        else if (i % 3 == 1) new org.apache.avro.util.Utf8(s"s$i")
        else null)
      rec.put("v",
        if (i % 2 == 0) java.lang.Boolean.valueOf(i % 4 == 0)
        else java.lang.Double.valueOf(i * 0.5))
      val items = new java.util.ArrayList[AnyRef]()
      (0 until i % 3).foreach { j =>
        items.add(
          if ((i + j) % 3 == 0) java.lang.Double.valueOf(j + 0.25)
          else if ((i + j) % 3 == 1) null
          else java.lang.Long.valueOf(i * 10L + j))
      }
      rec.put("arr", items)
      w.append(rec)
    }
    w.close()
    val f = Avro.parse(buf.toByteArray)
      .getOrElse(fail("general-union file rejected"))
    assert(f.fields.map(_.tpe) ==
      Seq("long", "union", "union", "array"))
    assert(f.rows.length == n)
    for (i <- 0 until n) {
      val r = f.rows(i)
      assert(r(0) == Some(i.toLong))
      val wantU: Option[Any] =
        if (i % 3 == 0) Some(i * 5L)
        else if (i % 3 == 1) Some(s"s$i")
        else None
      assert(r(1) == wantU, s"u at $i: ${r(1)}")
      val wantV: Option[Any] =
        if (i % 2 == 0) Some(i % 4 == 0) else Some(i * 0.5)
      assert(r(2) == wantV, s"v at $i")
      val wantArr = (0 until i % 3).map { j =>
        if ((i + j) % 3 == 0) Some(j + 0.25)
        else if ((i + j) % 3 == 1) None
        else Some(i * 10L + j)
      }
      assert(r(3) == Some(wantArr: Seq[Option[Any]]), s"arr at $i")
    }
    // a wire branch index past the list must REJECT, not invent —
    // pinned directly at the datum codec: a 3-branch union field
    // whose datum says branch 3 (zigzag 0x06) is malformed
    val uf = Seq(Avro.NField("u", Avro.NUnion(Seq(None,
      Some(Avro.NPrim("long")), Some(Avro.NPrim("string")))),
      nullable = false))
    def datum(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray
    // branch 1 (zigzag 0x02) + long 21 (zigzag 0x2a): decodes
    assert(Avro.decodeDatum(uf, datum(0x02, 0x2a)) ==
      Some(Seq(Some(21L))))
    // branch 0: the null branch
    assert(Avro.decodeDatum(uf, datum(0x00)) == Some(Seq(None)))
    // branch 3: out of range — rejected, never invented
    assert(Avro.decodeDatum(uf, datum(0x06, 0x2a)).isEmpty)
    // negative branch index: rejected
    assert(Avro.decodeDatum(uf, datum(0x01, 0x2a)).isEmpty)
  }

  test("differential: fixed type both directions (avro-java)") {
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.file.{DataFileReader, DataFileWriter,
      SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericData, GenericDatumReader,
      GenericDatumWriter, GenericRecord}
    val schema = SchemaBuilder.record("r").fields()
      .name("id").`type`().longType().noDefault()
      .name("h").`type`().fixed("md5x").size(16).noDefault()
      .endRecord()
    val bos = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, bos)
    val n = 17
    for (i <- 0 until n) {
      val rec = new GenericData.Record(schema)
      rec.put("id", i.toLong)
      rec.put("h", new GenericData.Fixed(schema.getField("h").schema(),
        Array.tabulate[Byte](16)(j => (i * 16 + j).toByte)))
      w.append(rec)
    }
    w.close()
    val got = Avro.parse(bos.toByteArray)
    assert(got.isDefined, "fixed-typed container rejected")
    assert(got.get.fields.map(_.tpe) == Seq("long", "fixed"))
    for (i <- 0 until n) {
      val h = got.get.rows(i)(1).get.asInstanceOf[Array[Byte]]
      assert(h.sameElements(Array.tabulate[Byte](16)(j =>
        (i * 16 + j).toByte)), s"row $i")
    }
    // ours → avro-java
    val nf = Seq(
      Avro.NField("id", Avro.NPrim("long"), nullable = false),
      Avro.NField("h", Avro.NFixed("md5y", 8), nullable = true))
    val rows: Seq[Avro.Row] = (0 until 9).map(i => Seq(
      Some(i.toLong),
      if (i % 4 == 2) None
      else Some(Array.tabulate[Byte](8)(j => (i + j).toByte))))
    val ours = Avro.buildNested("r2", nf, rows)
    val back = Avro.parse(ours).get
    for (i <- 0 until 9) {
      (rows(i)(1), back.rows(i)(1)) match {
        case (None, None) =>
        case (Some(a: Array[Byte]), Some(b)) =>
          assert(b.asInstanceOf[Array[Byte]].sameElements(a))
        case other => fail(s"row $i: $other")
      }
    }
    val rd = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(ours),
      new GenericDatumReader[GenericRecord]())
    var i = 0
    while (rd.hasNext) {
      val rec = rd.next()
      if (i % 4 == 2) assert(rec.get("h") == null)
      else assert(rec.get("h").asInstanceOf[GenericData.Fixed].bytes()
        .sameElements(Array.tabulate[Byte](8)(j => (i + j).toByte)))
      i += 1
    }
    rd.close()
    assert(i == 9)
  }

  test("differential: avro-java complex types -> our reader") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter,
      GenericRecord}
    import scala.jdk.CollectionConverters._
    val schema: Schema = SchemaBuilder.record("r").fields()
      .name("id").`type`().longType().noDefault()
      .name("xs").`type`().array().items().unionOf().nullType().and()
        .longType().endUnion().noDefault()
      .name("m").`type`().map().values().longType().noDefault()
      .name("e").`type`().enumeration("color")
        .symbols("red", "green", "blue").noDefault()
      .name("sub").`type`().record("inner").fields()
        .name("a").`type`().longType().noDefault()
        .name("b").`type`().unionOf().nullType().and().stringType()
          .endUnion().noDefault()
        .endRecord().noDefault()
      .endRecord()
    val bos = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, bos)
    val n = 23
    for (i <- 0 until n) {
      val rec = new GenericData.Record(schema)
      rec.put("id", i.toLong)
      rec.put("xs", (0 until i % 4).map(j =>
        if ((i + j) % 3 == 0) null
        else java.lang.Long.valueOf(i * 10L + j)).asJava)
      val m = new java.util.LinkedHashMap[String, java.lang.Long]()
      for (j <- 0 until i % 3) m.put(s"k$j", i * 100L + j)
      rec.put("m", m)
      rec.put("e", new GenericData.EnumSymbol(
        schema.getField("e").schema(), Seq("red", "green", "blue")(i % 3)))
      val inner = new GenericData.Record(
        schema.getField("sub").schema())
      inner.put("a", i * 7L)
      inner.put("b", if (i % 5 == 2) null else s"v$i")
      rec.put("sub", inner)
      w.append(rec)
    }
    w.close()
    val got = Avro.parse(bos.toByteArray)
    assert(got.isDefined, "complex-typed container rejected")
    val f = got.get
    assert(f.fields.map(_.tpe) ==
      Seq("long", "array", "map", "enum", "record"))
    assert(f.rows.length == n)
    for (i <- 0 until n) {
      val r = f.rows(i)
      assert(r(0) == Some(i.toLong))
      val xs = r(1).get.asInstanceOf[Seq[Option[Any]]]
      assert(xs == (0 until i % 4).map(j =>
        if ((i + j) % 3 == 0) None else Some(i * 10L + j)))
      val m = r(2).get.asInstanceOf[Seq[(String, Option[Any])]]
      assert(m.toMap.view.mapValues(_.get).toMap ==
        (0 until i % 3).map(j => s"k$j" -> (i * 100L + j)).toMap)
      assert(r(3) == Some(Seq("red", "green", "blue")(i % 3)))
      val sub = r(4).get.asInstanceOf[Avro.Row]
      assert(sub(0) == Some(i * 7L))
      assert(sub(1) == (if (i % 5 == 2) None else Some(s"v$i")))
    }
  }

  test("round trip: our nested writer -> avro-java reader") {
    import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import scala.jdk.CollectionConverters._
    val nf = Seq(
      Avro.NField("id", Avro.NPrim("long"), nullable = false),
      Avro.NField("xs",
        Avro.NArr(Avro.NPrim("long"), itemsNullable = true),
        nullable = true),
      Avro.NField("m",
        Avro.NMap(Avro.NPrim("string"), valuesNullable = false),
        nullable = false),
      Avro.NField("e", Avro.NEnum("shade", Seq("dark", "light")),
        nullable = false),
      Avro.NField("sub", Avro.NRec("inner2", Seq(
        Avro.NField("a", Avro.NPrim("long"), nullable = false))),
        nullable = false))
    val rows: Seq[Avro.Row] = (0 until 17).map { i =>
      Seq(
        Some(i.toLong),
        if (i % 6 == 3) None
        else Some((0 until i % 3).map(j =>
          if (j == 1) None else Some(i * 2L + j)): Seq[Option[Any]]),
        Some(Seq("k" -> Some(s"v$i"),
          "z" -> Some(i.toString)): Seq[(String, Option[Any])]),
        Some(Seq("dark", "light")(i % 2)),
        Some(Seq(Some(i * 3L)): Avro.Row))
    }
    for (codec <- Seq("null", "deflate")) {
      val bytes = Avro.buildNested("top", nf, rows, codec)
      // our own reader round-trips
      val back = Avro.parse(bytes)
      assert(back.isDefined && back.get.rows.length == rows.length)
      assert(back.get.rows == rows)
      // avro-java agrees
      val rd = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(bytes),
        new GenericDatumReader[GenericRecord]())
      var i = 0
      while (rd.hasNext) {
        val rec = rd.next()
        assert(rec.get("id") == i.toLong)
        val xs = rec.get("xs")
        if (i % 6 == 3) assert(xs == null)
        else {
          val got = xs.asInstanceOf[java.util.List[AnyRef]].asScala
          val want = (0 until i % 3).map(j =>
            if (j == 1) null else java.lang.Long.valueOf(i * 2L + j))
          assert(got == want, s"row $i xs")
        }
        val m = rec.get("m").asInstanceOf[java.util.Map[AnyRef, AnyRef]]
        assert(m.size == 2)
        assert(m.asScala.map { case (k, v) =>
          k.toString -> v.toString }.toMap ==
          Map("k" -> s"v$i", "z" -> i.toString))
        assert(rec.get("e").toString == Seq("dark", "light")(i % 2))
        assert(rec.get("sub").asInstanceOf[GenericRecord]
          .get("a") == i * 3L)
        i += 1
      }
      rd.close()
      assert(i == rows.length)
    }
  }

  test("mutation fuzz: corruption rejects or stays in-shape, no throw") {
    // The Avro container carries NO checksums — a flip landing inside
    // a STORED deflate region (or a null-codec value byte) decodes
    // silently to different VALUES. That is a property of the format,
    // not of this reader; what the reader guarantees is structure:
    // it never throws, and anything it accepts has the declared row
    // count and arity (sync markers, exact body consumption and the
    // schema walk catch everything structural).
    val r = new java.util.Random(0xc2b2ae3dL)
    val rows = mkRows(200)
    val bytes = Avro.build("rec", fields, rows, "deflate", blockRows = 50)
    var rejected = 0
    for (_ <- 1 to 300) {
      val m = bytes.clone()
      m(r.nextInt(m.length)) =
        (m(r.nextInt(m.length)) ^ (1 << r.nextInt(8))).toByte
      Avro.parse(m) match {
        case None => rejected += 1
        case Some(f) =>
          assert(f.rows.length == rows.length)
          assert(f.rows.forall(_.length == fields.length))
      }
    }
    assert(rejected > 100, s"only $rejected/300 rejected")
  }

  test("mutation fuzz: nested schema + every codec, no throw") {
    val r = new java.util.Random(0x9e3779b9L)
    val nf = Seq(
      Avro.NField("id", Avro.NPrim("long"), nullable = false),
      Avro.NField("xs",
        Avro.NArr(Avro.NPrim("long"), itemsNullable = true),
        nullable = true),
      Avro.NField("m",
        Avro.NMap(Avro.NPrim("string"), valuesNullable = false),
        nullable = false),
      Avro.NField("e", Avro.NEnum("en", Seq("x", "y")),
        nullable = false),
      Avro.NField("fx", Avro.NFixed("fx", 4), nullable = false))
    val rows: Seq[Avro.Row] = (0 until 40).map { i =>
      Seq(
        Some(i.toLong),
        if (i % 6 == 3) None
        else Some((0 until i % 3).map(k =>
          Some(i * 2L + k): Option[Any]): Seq[Option[Any]]),
        Some(Seq("k" -> Some(s"v$i")): Seq[(String, Option[Any])]),
        Some(Seq("x", "y")(i % 2)),
        Some(Array.tabulate[Byte](4)(j => (i + j).toByte)))
    }
    for (codec <- Avro.Codecs.toSeq.sorted) {
      val bytes = Avro.buildNested("n", nf, rows, codec, blockRows = 8)
      assert(Avro.parse(bytes).exists(_.rows.length == 40), codec)
      for (_ <- 1 to 250) {
        val m = bytes.clone()
        m(r.nextInt(m.length)) =
          (m(r.nextInt(m.length)) ^ (1 << r.nextInt(8))).toByte
        // never throws; anything accepted keeps arity
        Avro.parse(m).foreach(f =>
          assert(f.rows.forall(_.length == nf.length)))
      }
    }
  }

  test("garbage fuzz: arbitrary bytes never throw") {
    val r = new java.util.Random(0x165667b1L)
    for (_ <- 1 to 400) {
      val b = new Array[Byte](r.nextInt(400))
      r.nextBytes(b)
      Avro.parse(b)
      if (b.length >= 4) {
        b(0) = 'O'; b(1) = 'b'; b(2) = 'j'; b(3) = 1
        Avro.parse(b)
      }
    }
  }

  test("sync-marker mismatch between blocks stops the walk") {
    val rows = mkRows(100)
    val bytes = Avro.build("rec", fields, rows, "null", blockRows = 50)
    // find the second sync (trailing block 1): flip one byte of it
    val sync = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${Avro.schemaJson("rec", fields)}#${rows.length}"
        .getBytes("UTF-8"))
    // locate the first block's trailing sync by scanning from the end
    // of the header sync; simpler: corrupt the LAST 16 bytes (the
    // final block's sync)
    val m = bytes.clone()
    m(m.length - 1) = (m(m.length - 1) ^ 0x40).toByte
    assert(Avro.parse(m).isEmpty)
    assert(sync.length == 16)
  }

  test("differential: avro-java fixed-decimal (the spark-avro " +
    "layout) -> our reader") {
    import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter,
      GenericRecord}
    val fixedSchema = Schema.createFixed("dec8", null, null, 8)
    LogicalTypes.decimal(16, 3).addToSchema(fixedSchema)
    val schema: Schema = SchemaBuilder.record("r").fields()
      .name("id").`type`().longType().noDefault()
      .name("price").`type`(fixedSchema).noDefault()
      .endRecord()
    val bos = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, bos)
    val n = 40
    val expected = (0 until n).map(i =>
      new java.math.BigDecimal(
        java.math.BigInteger.valueOf(i * 98765L - 1234567L), 3))
    for (i <- 0 until n) {
      val rec = new GenericData.Record(schema)
      rec.put("id", i.toLong)
      // fixed-size big-endian two's complement, left-padded
      val un = expected(i).unscaledValue.toByteArray
      val buf = new Array[Byte](8)
      val sign: Byte = if (expected(i).signum < 0) -1 else 0
      java.util.Arrays.fill(buf, sign)
      System.arraycopy(un, 0, buf, 8 - un.length, un.length)
      rec.put("price", new GenericData.Fixed(fixedSchema, buf))
      w.append(rec)
    }
    w.close()
    val f = Avro.parse(bos.toByteArray).get
    assert(f.nfields(1).tpe ==
      Avro.NLogical("fixed", "decimal", 16, 3, 8))
    // the user-facing source surfaces real BigDecimals
    val rows = f.rows.map(r => graft.sources.AvroSource
      .toRow(f.nfields, r))
    val got = rows.map(r => (r.getLong(0),
      r.getAs[java.math.BigDecimal](1)))
    assert(got.map(_._1) == (0 until n).map(_.toLong))
    got.map(_._2).zip(expected).foreach { case (a, b) =>
      assert(a.compareTo(b) == 0, s"$a != $b")
    }
  }
}
