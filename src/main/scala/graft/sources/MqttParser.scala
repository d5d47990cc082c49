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
  def parseHits(lines: DataFrame): DataFrame = {
    graft.functions.ParseHitPayload.register(lines.sparkSession)
    lines
      // Payload decode is ONE native single-pass kernel
      // (functions.ParseHitPayload): the previous split()+getItem+cast
      // chain re-evaluated split(payload) ~10× per row after Catalyst's
      // projection collapse re-inlined the array column through the
      // filter boundaries (verified in the plan). The struct is NULL
      // exactly when the reference's payload guards (≥ 7 tokens, time
      // fields ≥ 17 chars, no leading '.') reject the line.
      .select(col("topic"), expr("parse_hit_payload(payload)").as("ph"))
      .filter(col("ph").isNotNull)
      .withColumn("t", split(col("topic"), "/"))
      // topic guards (mqtt.h:391-395)
      .filter(size(col("t")) >= 4 &&
        col("t").getItem(2) =!= "" && col("t").getItem(2) =!= "cluster")
      .withColumn("user", col("t").getItem(2))
      .withColumn("station_id", col("t").getItem(3))
      .filter(col("ph.start_ns") <= col("ph.end_ns"))
      .select(
        col("user"), col("station_id"),
        expr("poly_hash(concat(user, station_id))").as("hash"),
        col("ph.start_ns").as("start_ns"), col("ph.end_ns").as("end_ns"),
        col("ph.time_acc").as("time_acc"),
        col("ph.ublox_counter").as("ublox_counter"),
        col("ph.fix").as("fix"),
        col("ph.gnss_time_grid").as("gnss_time_grid"),
        col("ph.utc").as("utc"))
  }
}
