package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One user-activity observation on the event stream (raw-nanos event
  * time, the engine's canonical axis). */
case class ActivityEvent(userId: Long, tsNs: Long)

/** Streaming twin of the `active_users` DAU/WAU readout: the sliding
  * 7-day DISTINCT maintained live by the SAME cover-set trick as the
  * batch query, as the documented multi-stateful chain —
  * `dropDuplicatesWithinWatermark` → day-windowed aggregation in
  * append mode.
  *
  * Each event explodes to its tagged cover rows: one ('dau', day) row
  * plus seven ('wau', day..day+6) rows. ONE watermarked dedup on
  * (userId, tag, cover-day) then makes every user count at most once
  * per report day per metric — exactly the batch query's second
  * distinct — and the downstream tumbling-day count is a plain
  * windowed aggregation whose state is one BIGINT per (day, tag).
  * There is never a per-window distinct-user SET in state (what a
  * naive `window().agg(countDistinct)` would need, and Spark rightly
  * refuses on streams); the dedup state is watermark-bounded, late
  * events inside the watermark land exactly once, and replays are
  * idempotent by the dedup key.
  *
  * Event-time axis: both stateful operators ride ONE watermarked
  * column — the COVER day (a wau cover points up to 6 days past its
  * event, so the event's own day cannot finalize the windows the cover
  * feeds). The default 7-day delay re-anchors the watermark to
  * (max event day − 1): day d's (dau, wau) pair seals once events from
  * day d+2 arrive, and an event landing ≤ 2 days out of order still
  * counts — the end-of-day-rollup semantics of a dashboard, with the
  * delay as the lateness knob. */
object StreamingActiveUsers {

  final val NsPerDay = 86400000000000L

  def activeStream(events: Dataset[ActivityEvent],
      watermarkDelay: String = "7 days"): DataFrame =
    events
      .withColumn("day", expr(s"tsNs div ${NsPerDay}L"))
      .selectExpr("userId", "day",
        "explode(concat(array(named_struct('tag', 'dau', 'cday', day)), " +
          "transform(sequence(day, day + 6), " +
          "d -> named_struct('tag', 'wau', 'cday', d)))) AS c")
      .selectExpr("userId", "c.tag AS tag", "c.cday AS cday")
      .withColumn("ts", timestamp_seconds(expr("cday * 86400")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("userId", "tag", "cday")
      .groupBy(window(col("ts"), "1 day"), col("tag"))
      .agg(count(lit(1)).as("n"))
      .selectExpr("unix_seconds(window.start) div 86400 AS day",
        "tag", "n")
}
