package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Watermarked windowed aggregation — the R11 detector summary as a
  * Structured Streaming query (`withWatermark` + `groupBy(window(...))`,
  * append mode): per station per tumbling event-time window, incoming
  * count and fixed-point mean value. Windows seal (and emit exactly once)
  * when the watermark passes the window end — the event-time upgrade of
  * the reference's wall-clock summary interval (SURVEY §7.3 item 4).
  */
object StreamingSummary {

  def summaryStream(events: Dataset[StationEvent],
                    windowLength: String = "1 day",
                    watermarkDelay: String = "0 seconds"): DataFrame =
    events
      .withColumn("ts", timestamp_micros(expr("startNs div 1000")))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("station"))
      .agg(count(lit(1)).as("incoming"),
        (sum("valueCents") / 100.0 / count(lit(1))).as("mean_value"))
      .select(
        unix_micros(col("window.start")).as("win_start_us"),
        col("station"), col("incoming"), col("mean_value"))
}
