package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a batch DataFrame query over the driver's
  * parquet tables; [[oracleSql]] carries the DuckDB-equivalent SQL for the
  * hash-compare correctness gate. Column names and row order are made to
  * match on both sides; floating-point aggregates are rounded to dodge
  * summation-order ulp differences between engines.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The domain core: L1 coincidence clusters from the event stream. */
  def entry(spark: SparkSession): DataFrame =
    queries("coincidence_l1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Detector.queries ++ Registry.queries ++ Geodesic.queries ++ Pipeline.queries ++ Wire.queries ++ Assembly.queries ++ streaming.DetectorApp.queries ++ Graph.queries ++ Analytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ Detector.oracleSql ++ Registry.oracleSql ++ Geodesic.oracleSql ++ Pipeline.oracleSql ++ Wire.oracleSql ++ Assembly.oracleSql ++ streaming.DetectorApp.oracleSql ++ Graph.oracleSql ++ Analytics.oracleSql
}
