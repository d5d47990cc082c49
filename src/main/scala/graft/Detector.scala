package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Detector-network analytics (SURVEY.md §2.2–§2.5) over the `events`
  * table mapped onto the hit stream: user_id = station key, ts = event
  * time (µs-truncated to match Spark's parquet nanos→micros read).
  */
object Detector {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
