package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg table-format pins: create → read round trip through the
  * real metadata-json → manifest-list-avro → manifest-avro chain
  * (decoded by OUR Avro codec), multi-snapshot commits with time
  * travel by snapshot id, version-hint vs highest-version
  * resolution, schema JSON type mapping both ways, delete-manifest
  * and unsupported-type rejections, and pushdown on the final
  * scan. */
class IcebergSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpTable(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$tag")
      .toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/tbl"
  }

  private def seed(n: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => (i.toLong, s"row$i", i % 3)).toDF(
      "id", "txt", "bucket")
  }

  test("create + read round-trips through the avro manifest chain") {
    val t = tmpTable("ice_basic")
    Iceberg.create(spark, seed(20), t)
    val got = Iceberg.read(spark, t)
    assert(got.count() == 20)
    assert(got.schema.fieldNames.toSeq == Seq("id", "txt", "bucket"))
    assert(got.schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
    // the snapshot walked a real manifest list + manifest
    val snap = Iceberg.snapshot(spark, t)
    assert(snap.files.nonEmpty &&
      snap.files.forall(_.format == "PARQUET"))
    assert(snap.files.map(_.recordCount).sum == 20)
  }

  test("multi-snapshot commits + time travel by snapshot id") {
    val s = spark
    import s.implicits._
    val t = tmpTable("ice_tt")
    Iceberg.create(spark, seed(20), t)
    // snapshot 2: the table rewritten as a filtered subset
    val df2 = seed(20).filter($"id" >= 5)
    df2.write.parquet(s"$t/data/s2")
    val files2 = Iceberg.countsByFile(spark, df2.schema,
      s"$t/data/s2")
    Iceberg.commit(spark, t, 2L, 2L, df2.schema, files2,
      prior = Seq((1L, s"$t/metadata/snap-1.avro")))
    assert(Iceberg.read(spark, t).count() == 15)
    assert(Iceberg.read(spark, t, Some(1L)).count() == 20)
    assert(Iceberg.read(spark, t, Some(2L)).count() == 15)
    // highest-version resolution when the hint is deleted
    new java.io.File(s"$t/metadata/version-hint.text").delete()
    assert(Iceberg.read(spark, t).count() == 15)
  }

  test("schema JSON maps both ways incl. nesting") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType),
      StructField("c", ArrayType(IntegerType, containsNull = true)),
      StructField("d", StructType(Seq(
        StructField("x", DoubleType),
        StructField("y", DecimalType(10, 2))))),
      StructField("e", TimestampType),
      StructField("f", DateType)))
    val json = Iceberg.toIcebergSchemaJson(schema)
    val back = Iceberg.toSparkType(
      JsonMini.parse(json).get).get
    assert(back == schema)
    // honest rejections
    assert(Iceberg.toSparkType("uuid").isEmpty)
    assert(Iceberg.toSparkType("time").isEmpty)
    assert(Iceberg.toSparkType(Map("type" -> "map")).isEmpty)
  }

  test("delete manifests and torn tables reject") {
    val t = tmpTable("ice_del")
    Iceberg.create(spark, seed(6), t)
    // flip the manifest-list content field to 1 (delete manifest):
    // rewrite the list avro with content=1
    val lst = s"$t/metadata/snap-1.avro"
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(lst))
    val parsed = Avro.parse(bytes).get
    val cIdx = parsed.nfields.indexWhere(_.name == "content")
    val rows = parsed.rows.map(r => r.updated(cIdx, Some(1)))
    java.nio.file.Files.write(java.nio.file.Paths.get(lst),
      Avro.buildNested(parsed.recordName, parsed.nfields, rows))
    // drop hadoop's local-FS checksum sidecar — the rewrite above
    // bypassed it deliberately
    new java.io.File(s"$t/metadata/.snap-1.avro.crc").delete()
    assertThrows[IllegalArgumentException](Iceberg.read(spark, t))
    // a missing table rejects loudly
    assertThrows[IllegalArgumentException](
      Iceberg.snapshot(spark, tmpTable("ice_missing")))
  }

  test("pushdown reaches the parquet scan") {
    val s = spark
    import s.implicits._
    val t = tmpTable("ice_push")
    Iceberg.create(spark, seed(30), t)
    val plan = Iceberg.read(spark, t).filter($"id" > 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(id,10)"))
  }
}
