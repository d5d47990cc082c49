package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One page-view / one purchase on the two product-event streams. */
case class ViewEvent(userId: Long, viewId: Long, tsNs: Long)
case class PurchaseEvent(userId: Long, purchaseId: Long, tsNs: Long)

/** Watermarked STREAM-STREAM interval join — the attribution candidate
  * generator live: every (purchase, view) pair of the same user with
  * the view inside the trailing attribution window. This is the one
  * Structured Streaming operator class the rest of the streaming
  * surface didn't exercise: both sides are unbounded, so Spark buffers
  * each side's rows in state and the JOIN CONDITION's time bounds plus
  * the watermarks are what let it evict — a view older than
  * (watermark − window) can never match a future purchase and is
  * dropped; state is bounded by (event rate × window), not history.
  *
  * The q32 batch query picks first/last per purchase; the stream emits
  * the full candidate set (append mode, exactly-once per pair) and the
  * dashboard's foreachBatch upsert keeps min/max view per purchase —
  * aggregating over a stream-stream join's append output is the
  * documented composition; the parity spec folds the emitted pairs and
  * matches the batch q32 attribution rows. */
object StreamingAttribution {

  final val WindowNs = 600000000000L // 10 minutes

  def attributionStream(views: Dataset[ViewEvent],
      purchases: Dataset[PurchaseEvent],
      watermarkDelay: String = "10 seconds"): DataFrame = {
    val v = views.toDF()
      .withColumn("vts", timestamp_micros(expr("tsNs div 1000")))
      .withWatermark("vts", watermarkDelay)
      .select(col("userId").as("v_user"), col("viewId"),
        col("tsNs").as("v_ns"), col("vts"))
    val p = purchases.toDF()
      .withColumn("pts", timestamp_micros(expr("tsNs div 1000")))
      .withWatermark("pts", watermarkDelay)
      .select(col("userId").as("p_user"), col("purchaseId"),
        col("tsNs").as("p_ns"), col("pts"))
    // the join's time bounds are µs-axis (Spark TimestampType is the
    // state-watermark carrier — extra range predicates over raw long
    // columns break the join's watermark analysis, and a post-join
    // filter on buffered-side columns is not evaluable either), so the
    // pair set is defined at microsecond resolution: two events inside
    // the same microsecond join both ways. The batch comparator uses
    // the identical µs rule.
    p.join(v,
      col("p_user") === col("v_user") &&
        col("vts") <= col("pts") &&
        col("vts") >= col("pts") - expr("INTERVAL 10 MINUTES"))
      .select(col("p_user").as("user_id"), col("purchaseId"),
        col("viewId"), col("p_ns"), col("v_ns"))
  }

  /** LEFT OUTER form: purchases with NO in-window view also emit,
    * exactly once, with a null view — but only after the view-side
    * watermark passes the purchase's window (before that a matching
    * view could still arrive, so the engine must hold the row back;
    * the unmatched rows' latency IS the watermark delay, the outer
    * stream-stream join contract). The view-less rows are the
    * `first_touch = −1` population of the batch q32. */
  def attributionStreamOuter(views: Dataset[ViewEvent],
      purchases: Dataset[PurchaseEvent],
      watermarkDelay: String = "10 seconds"): DataFrame = {
    val v = views.toDF()
      .withColumn("vts", timestamp_micros(expr("tsNs div 1000")))
      .withWatermark("vts", watermarkDelay)
      .select(col("userId").as("v_user"), col("viewId"),
        col("tsNs").as("v_ns"), col("vts"))
    val p = purchases.toDF()
      .withColumn("pts", timestamp_micros(expr("tsNs div 1000")))
      .withWatermark("pts", watermarkDelay)
      .select(col("userId").as("p_user"), col("purchaseId"),
        col("tsNs").as("p_ns"), col("pts"))
    p.join(v,
      col("p_user") === col("v_user") &&
        col("vts") <= col("pts") &&
        col("vts") >= col("pts") - expr("INTERVAL 10 MINUTES"),
      "left_outer")
      .select(col("p_user").as("user_id"), col("purchaseId"),
        col("viewId"), col("p_ns"), col("v_ns"))
  }
}
