package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Large-scale training-data pipeline operators: deduplication,
  * similarity search, text analysis, multimodal plumbing — over the
  * `documents` and `embeddings` tables.
  */
object Pipeline {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
