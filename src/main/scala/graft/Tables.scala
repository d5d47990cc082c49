package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-supplied parquet tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * plan runs at sf0.001 (smoke), sf0.01 (oracle), sf0.1 (bench) — and, by
  * design, unchanged on a partitioned 100 TB layout: every reader is a plain
  * parquet scan that Catalyst can prune/push into.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Inferred-schema cache, keyed by (path, nanosAsLong conf): every
    * `spark.read.parquet` without a user schema re-lists the path and
    * re-reads a footer at PLAN time, and the suite constructs each base
    * table hundreds of times per session (r14: ~50-100 ms of fixed
    * driver work per query). The schema of a given data directory is
    * immutable for the life of the JVM here (driver test corpora;
    * production jobs pin their table schemas the same way), so infer
    * once and pass the schema explicitly — the scan itself is
    * unchanged, including pushdown/pruning. The nanosAsLong conf is
    * part of the key because it changes the INFERRED type of events.ts
    * (sessions in one JVM may differ — the test suite does). */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val nanos = spark.conf.getOption(
      "spark.sql.legacy.parquet.nanosAsLong").getOrElse("false")
    val st = schemaCache.computeIfAbsent((path, nanos),
      _ => spark.read.parquet(path).schema)
    spark.read.schema(st).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** Nanosecond longs are the engine's canonical event time (SURVEY.md
    * §1.2), matching the DuckDB oracles' `epoch_ns(ts)`. Driver data has
    * shipped `ts` both as nanosecond-precision parquet (which Spark's µs
    * TimestampType rejects — hence `nanosAsLong`) and as a plain µs
    * timestamp; normalize either to an i64 nanos column so every consumer
    * sees one type. The conversion is a scan-stage projection — column
    * pruning and `ts` range pushdown still reach the parquet reader. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts", org.apache.spark.sql.functions.expr(
        // NTZ-safe: the session TZ is pinned to UTC, matching DuckDB's
        // treatment of naive timestamps in epoch_ns().
        "unix_micros(cast(ts as timestamp)) * 1000L"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
