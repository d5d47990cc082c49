package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Histogram snapshot + rollup (SURVEY §2.4 A7/A8): the reference writes
  * per-station-pair `.hist` files every 24 h and a standalone tool sums
  * them per bin (reference src/analysis/stationcoincidence.cpp:111-212,
  * src/aggregation.cpp:125-203). Spark-native form: partitioned columnar
  * snapshots + a grouped-sum rollup — `groupBy(pair, bin).sum` replaces
  * the per-directory file walk, and scales by partitioning on the pair.
  */
object Histograms {

  /** Snapshot a (station_lo, station_hi, bin, cnt) histogram table,
    * partitioned by pair for pruned rollups. */
  def save(hist: DataFrame, dir: String): Unit =
    hist.write.mode(SaveMode.Append)
      .partitionBy("station_lo", "station_hi")
      .parquet(dir)

  /** Roll up all snapshots: per pair and bin, total counts (A8's
    * `groupBy(bin).sum(count)` over every file in the directory). */
  def rollup(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy("station_lo", "station_hi", "bin")
      .agg(sum("cnt").as("cnt"))

  /** Rollup metadata (A8: sums of totals, last-write-wins is replaced by
    * deterministic max for the scalar fields). */
  def rollupMeta(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy("station_lo", "station_hi")
      .agg(sum("cnt").as("total"), count(lit(1)).as("n_bins_rows"),
        min("bin").as("min_bin"), max("bin").as("max_bin"))

  /** A7 `.adj` adjacency matrix (reference
    * src/analysis/stationcoincidence.cpp:198-211 writes a dense symmetric
    * station×station matrix of per-pair histogram totals): symmetrize the
    * sparse (station_lo, station_hi, total) pair rows and pivot stations
    * to columns. The matrix is dense only in the station dimension (tiny);
    * the 100 TB-scale input stays sparse pair rows. */
  def adjacency(pairTotals: DataFrame): DataFrame = {
    val sym = pairTotals
      .select(col("station_lo").as("a"), col("station_hi").as("b"),
        col("total"))
      .unionByName(pairTotals.select(col("station_hi").as("a"),
        col("station_lo").as("b"), col("total")))
    sym.groupBy("a").pivot("b").agg(first("total"))
      .na.fill(0L)
      .orderBy("a")
  }

  /** The `.adj` text lines: header `;hex;hex;…`, then one
    * `hex;n;n;…` row per station (stationcoincidence.cpp:198-206). */
  def adjacencyLines(adj: DataFrame): Seq[String] = {
    val cols = adj.columns.drop(1)
    val header = cols.map(c => f";${c.toLong}%x").mkString
    val rows = adj.orderBy("a").collect().map { r =>
      f"${r.getLong(0)}%x" + cols.indices.map(i => s";${r.getLong(i + 1)}").mkString
    }
    header +: rows.toSeq
  }

  /** The `.stations` list lines `hex;site;lat;lon;h`
    * (stationcoincidence.cpp:140-145). */
  def stationLines(stations: DataFrame): DataFrame =
    stations.select(concat_ws(";",
      lower(hex(col("station"))), concat(lit("site_"), col("station")),
      col("lat"), col("lon"), col("h")).as("line"))

  // ---- reference text formats (S6): `<bin> <count>` lines in *.hist,
  // ---- `<key> <value> [unit]` lines in *.meta (aggregation.cpp:96-174)

  /** Scan a directory tree of `*.hist` files: one (file, bin, count) row
    * per line — `spark.read.csv` with a space delimiter replaces the
    * reference's recursive directory walk. */
  def readHistFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("delimiter", " ")
      .schema("bin DOUBLE, cnt LONG")
      .csv(s"$dir/*.hist")
      .withColumn("file", input_file_name())

  /** A8 rollup over text histograms: sum counts per bin across all files
    * (reference src/aggregation.cpp:125-160 accumulates `bins[bin] +=
    * count` per directory). */
  def rollupHistFiles(spark: SparkSession, dir: String): DataFrame =
    readHistFiles(spark, dir)
      .groupBy("bin").agg(sum("cnt").as("cnt"))

  /** Scan `*.meta` files (`key value [unit]`), typed as strings — the
    * reference sums total/uptime/sample_time and keeps the last
    * distance/bin_width (aggregation.cpp:161-203); rollupMetaFiles sums
    * the numeric keys and takes max for the scalar ones
    * (deterministic replacement for last-write-wins). */
  def readMetaFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("delimiter", " ")
      .schema("key STRING, value DOUBLE, unit STRING")
      .csv(s"$dir/*.meta")
      .withColumn("file", input_file_name())

  /** Write reference-format `.hist` text files: one `<lo>_<hi>.hist` per
    * station pair holding `<bin> <count>` lines sorted by bin — the
    * layout stationcoincidence.cpp:179-186 emits and
    * aggregation.cpp:133-147 parses back. Driver-side text renderer like
    * [[adjacencyLines]] (the pair×bin dimension is tiny — ≤ 2000 bins per
    * pair); the 100 TB path stays the [[save]]/[[rollup]] parquet pair.
    * Bin values use Java double round-trip formatting, so
    * `readHistFiles` recovers them bit-exactly. */
  def writeHistFiles(hist: DataFrame, dir: String): Unit = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    hist.select(col("station_lo").cast("long"),
        col("station_hi").cast("long"), col("bin").cast("double"),
        col("cnt").cast("long"))
      .collect()
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .foreach { case ((lo, hi), rows) =>
        val lines = rows.map(r => (r.getDouble(2), r.getLong(3)))
          .sortBy(_._1)
          .map { case (b, c) => s"${fmt(b)} $c" }
        java.nio.file.Files.write(d.resolve(s"${lo}_$hi.hist"),
          (lines.mkString("\n") + "\n").getBytes("US-ASCII"))
      }
  }

  /** Write reference-format `.meta` text files (`<key> <value> <unit>`,
    * the aggregator's canonical 3-token form — aggregation.cpp:150-174
    * skips any line that is not exactly 3 tokens, including the
    * `sample_time …min` spacing quirk stationcoincidence emits, so the
    * canonical form is the faithful one). Expects one row per pair with
    * columns station_lo, station_hi, bin_width, distance_m, total,
    * uptime_min, sample_time_min. */
  def writeMetaFiles(meta: DataFrame, dir: String): Unit = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    meta.select(col("station_lo").cast("long"),
        col("station_hi").cast("long"), col("bin_width").cast("double"),
        col("distance_m").cast("double"), col("total").cast("long"),
        col("uptime_min").cast("long"), col("sample_time_min").cast("long"))
      .collect()
      .foreach { r =>
        val content =
          s"bin_width ${fmt(r.getDouble(2))} ns\n" +
          s"distance ${fmt(r.getDouble(3))} m\n" +
          s"total ${r.getLong(4)} 1\n" +
          s"uptime ${r.getLong(5)} min\n" +
          s"sample_time ${r.getLong(6)} min\n"
        java.nio.file.Files.write(
          d.resolve(s"${r.getLong(0)}_${r.getLong(1)}.meta"),
          content.getBytes("US-ASCII"))
      }
  }

  /** Integral doubles print without the trailing `.0` (the reference
    * writes ints via std::to_string); everything else uses Java's
    * round-trippable shortest form. */
  private def fmt(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  def rollupMetaFiles(spark: SparkSession, dir: String): DataFrame =
    readMetaFiles(spark, dir)
      .groupBy("key")
      .agg(
        sum(when(col("key").isin("total", "uptime", "sample_time"),
          col("value"))).as("summed"),
        max(when(!col("key").isin("total", "uptime", "sample_time"),
          col("value"))).as("kept"))
      .select(col("key"), coalesce(col("summed"), col("kept")).as("value"))
}
