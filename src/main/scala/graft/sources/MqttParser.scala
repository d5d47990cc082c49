package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wire-format parsers for the reference's MQTT text protocols
  * (FIXTURES.md §1; reference include/source/mqtt.h:214-247, 386-433) as
  * pure column expressions — a `Dataset[String]` of raw lines becomes a
  * typed hit table with the reference's rejection rules applied:
  *
  *  - topic must have ≥ 4 '/'-tokens and user ∉ {"", "cluster"}
  *    (mqtt.h:391-395);
  *  - payload fields 0/1 are decimal seconds, ≥ 17 chars, not starting
  *    with '.' (mqtt.h:218-223), scaled ×1e9 to i64 nanos;
  *  - start ≤ end (mqtt.h:242-244).
  *
  * All expressions are engine-portable (mirrored in the DuckDB oracle).
  */
object MqttParser {

  /** Parse single-hit event lines. Input columns: `topic`, `payload`.
    * The station key is a portable polynomial hash of user+station_id
    * (stands in for the reference's std::hash of site_id — SURVEY §1.2
    * requires only determinism + injectivity-in-practice).
    * Output: parsed + validity-filtered hits. */
  def parseHits(lines: DataFrame): DataFrame =
    lines
      .withColumn("t", split(col("topic"), "/"))
      .withColumn("p", split(col("payload"), " "))
      // topic guards (mqtt.h:391-395)
      .filter(size(col("t")) >= 4 &&
        col("t").getItem(2) =!= "" && col("t").getItem(2) =!= "cluster")
      .withColumn("user", col("t").getItem(2))
      .withColumn("station_id", col("t").getItem(3))
      // payload guards: field width and leading '.' (mqtt.h:218-223)
      .filter(size(col("p")) >= 7 &&
        length(col("p").getItem(0)) >= 17 && length(col("p").getItem(1)) >= 17 &&
        substring(col("p").getItem(0), 1, 1) =!= "." &&
        substring(col("p").getItem(1), 1, 1) =!= ".")
      .withColumn("start_ns",
        (col("p").getItem(0).cast("decimal(30,9)") * 1000000000L).cast("long"))
      .withColumn("end_ns",
        (col("p").getItem(1).cast("decimal(30,9)") * 1000000000L).cast("long"))
      .filter(col("start_ns") <= col("end_ns"))
      .select(
        col("user"), col("station_id"),
        expr("poly_hash(concat(user, station_id))").as("hash"),
        col("start_ns"), col("end_ns"),
        col("p").getItem(2).cast("long").as("time_acc"),
        col("p").getItem(3).cast("int").as("ublox_counter"),
        col("p").getItem(4).cast("int").as("fix"),
        col("p").getItem(5).cast("int").as("gnss_time_grid"),
        col("p").getItem(6).cast("int").as("utc"))
}
