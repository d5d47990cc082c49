package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-message assembly + pair-uptime surface (SURVEY §2.1 S3/S4, §2.4
  * A6): the reference reassembles multi-part records by shared key with a
  * completeness condition (message count for L1 re-ingest, a 6-bit field
  * bitmask for detector info) and accounts per-pair both-reliable uptime.
  */
object Assembly {

  /** S3-shape: multi-line L1 record reassembly. Lines share a uuid; a
    * record completes when all `n` constituents arrived (reference
    * include/source/mqtt.h:170-212 decrements a countdown per line) —
    * batch form: groupBy(uuid) with count(*) = n gate; the trailing
    * partial group is dropped, as the reference's abort does. */
  private def l1Reassembly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id"), col("user_id").as("station"),
      (expr("ts div 1000") * 1000).as("start_ns"))
      .withColumn("uuid", expr("event_id div 3"))
      .withColumn("n", lit(3L))
      .withColumn("duration", (col("event_id") % 500) * 1000)
      .groupBy("uuid")
      .agg(count(lit(1)).as("n_got"), max("n").as("n_want"),
        min("start_ns").as("start_ns"),
        (min("start_ns") + max("duration")).as("end_ns"),
        countDistinct("station").as("n_stations"))
      .filter(col("n_got") === col("n_want"))
      .select("uuid", "start_ns", "end_ns", "n_got", "n_stations")
      .orderBy("uuid")

  /** S4-shape: detector-info assembly gated by a completeness bitmask
    * (reference include/source/mqtt.h:98-103: six mandatory fields tracked
    * as bits, initial 0x3F): per (station, day), OR together the bits of
    * the field names seen; the record assembles only at mask 63. */
  private def detinfoAssembly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("user_id").as("station"),
      (expr("ts div 1000") * 1000).as("start_ns"),
      (col("event_id") % 6).as("field_id"))
      .withColumn("day", expr("start_ns div 86400000000000"))
      .groupBy("station", "day")
      .agg(count(lit(1)).as("n_msgs"),
        expr("bit_or(shiftleft(1L, cast(field_id AS int)))").as("mask"))
      .select(col("station"), col("day"), col("n_msgs"), col("mask"),
        (col("mask") === 63L).as("complete"))
      .orderBy("station", "day")

  /** A6-shape: station-pair both-reliable uptime. Reliability per station
    * per day = the R6 accept-quality proxy (mean value ≤ threshold);
    * uptime = days both stations reliable × 1440 min (reference
    * src/analysis/stationcoincidence.cpp:82-108 accumulates minutes while
    * its online counter is 2). Pair candidates via same-day join, so the
    * pair matrix never materializes beyond co-active days. */
  private def pairUptime(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir).select(
      col("user_id").as("station"),
      (expr("ts div 1000") * 1000).as("start_ns"),
      col("value"))
      .withColumn("day", expr("start_ns div 86400000000000"))
      .groupBy("station", "day")
      .agg((sum(round(col("value") * 100).cast("long")) / 100.0 /
        count(lit(1))).as("mv"))
      .filter(col("mv") <= 55.0)
      .select("station", "day")
    // same-day self-join for pair candidates (measured: the array-explode
    // alternative allocates one struct per pair interpreted and is ~2x
    // slower at 1500 stations; the join sides broadcast at this size)
    val a = daily.select(col("station").as("st_a"), col("day"))
    val b = daily.select(col("station").as("st_b"), col("day"))
    a.join(b, Seq("day")).filter(col("st_a") < col("st_b"))
      .groupBy("st_a", "st_b")
      .agg(count(lit(1)).as("days_both"),
        (count(lit(1)) * 1440L).as("uptime_min"))
      .orderBy("st_a", "st_b")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l1_reassembly"    -> l1Reassembly _,
    "detinfo_assembly" -> detinfoAssembly _,
    "pair_uptime"      -> pairUptime _
  )

  def oracleSql: Map[String, String] = Map(
    "l1_reassembly" ->
      """WITH l AS (
        |  SELECT event_id, user_id AS station, epoch_ns(ts) AS start_ns,
        |    event_id // 3 AS uuid, 3 AS n,
        |    (event_id % 500) * 1000 AS duration
        |  FROM events)
        |SELECT uuid, min(start_ns) AS start_ns,
        |  min(start_ns) + max(duration) AS end_ns,
        |  count(*) AS n_got, count(DISTINCT station) AS n_stations
        |FROM l GROUP BY uuid HAVING count(*) = max(n)
        |ORDER BY uuid""".stripMargin,
    "detinfo_assembly" ->
      """WITH m AS (
        |  SELECT user_id AS station, epoch_ns(ts) // 86400000000000 AS day,
        |    event_id % 6 AS field_id
        |  FROM events)
        |SELECT station, day, count(*) AS n_msgs,
        |  bit_or(CAST(1 AS BIGINT) << CAST(field_id AS INT)) AS mask,
        |  bit_or(CAST(1 AS BIGINT) << CAST(field_id AS INT)) = 63 AS complete
        |FROM m GROUP BY station, day ORDER BY station, day""".stripMargin,
    "pair_uptime" ->
      """WITH daily AS (
        |  SELECT user_id AS station,
        |    epoch_ns(ts) // 86400000000000 AS day,
        |    sum(CAST(round(value * 100) AS BIGINT)) / 100.0 / count(*) AS mv
        |  FROM events GROUP BY 1, 2),
        |rel AS (SELECT station, day FROM daily WHERE mv <= 55.0)
        |SELECT a.station AS st_a, b.station AS st_b,
        |  count(*) AS days_both, count(*) * 1440 AS uptime_min
        |FROM rel a JOIN rel b ON a.day = b.day AND a.station < b.station
        |GROUP BY 1, 2 ORDER BY st_a, st_b""".stripMargin
  )
}
