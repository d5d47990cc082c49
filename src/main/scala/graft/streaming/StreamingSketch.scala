package graft.streaming

import graft.functions.KMinValues
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** One scrambled token-hash observation on the ingest stream. */
case class SketchTok(source: String, h: Long)

/** Streaming twin of the KMV sketch build: the per-source K-minimum-
  * values buffer maintained INCREMENTALLY. The batch argument for
  * [[graft.functions.KMinValues]] — bounded mergeable state — is
  * exactly the property a streaming aggregation needs: run in update
  * mode, the aggregator's K-long sorted buffer IS the persisted
  * aggregation state, each micro-batch folds in via the same
  * reduce/merge pair (with map-side partial aggregation), and the
  * last update per source is the current sketch. No custom stateful
  * operator; the distinct-count read-out is shared with the spec. */
object StreamingSketch {

  /** Running per-source KMV sketch. Run with `outputMode("update")`. */
  def kmvStream(toks: Dataset[SketchTok], k: Int): DataFrame = {
    val kmin = udaf(new KMinValues(k), Encoders.scalaLong)
    toks.toDF().groupBy("source").agg(kmin(col("h")).as("ks"))
  }

  /** The batch kmv_distinct estimator arithmetic: exact size when the
    * sketch is short of k, else (k−1)·P / h_k. */
  def estimate(ks: Seq[Long], k: Int, p: Long): Double =
    if (ks.size < k) ks.size.toDouble
    else (k - 1).toDouble * p / math.max(ks(k - 1), 1L)
}
