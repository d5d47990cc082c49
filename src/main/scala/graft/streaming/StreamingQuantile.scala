package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One measured document on the profiling stream. */
case class QuantDoc(docId: Long, nTokens: Long)

/** Streaming twin of [[graft.Pipeline]]'s `quantile_sketch` state: the
  * (value → count) histogram maintained INCREMENTALLY. The batch
  * sketch's whole scale argument is that its state is a domain-sized
  * histogram mergeable by addition — this is that argument run as a
  * stream: Spark's own incremental aggregation state (update mode)
  * keyed by the VALUE, so the state shards across executors and each
  * micro-batch folds in with map-side partial aggregation. No custom
  * stateful operator is needed — mergeable-by-addition is exactly what
  * a streaming `groupBy(x).count` already is; the quantile read-out is
  * a domain-sized fold a `foreachBatch` sink runs per trigger.
  *
  * [[quantiles]] is the read-out arithmetic, shared verbatim with the
  * spec — a third independent derivation (after the Spark batch plan
  * and the DuckDB oracle) of the same integer formulas. */
object StreamingQuantile {

  /** Running value histogram over the token-count stream. Run with
    * `outputMode("update")`: each trigger emits the updated (x, c)
    * rows; the LAST update per value is the current count. */
  def histogramStream(docs: Dataset[QuantDoc]): DataFrame =
    docs.toDF().groupBy(col("nTokens").as("x"))
      .agg(count(lit(1)).as("c"))

  /** Quantile extraction from a materialized value histogram — the
    * identical integer arithmetic as the batch sketch: per q_ppm the
    * estimate is the upper edge of the first equi-width bin whose
    * cumulative count reaches ceil(q·n), the exact quantile the first
    * VALUE whose cumulative count reaches it. Returns rows of
    * (q_ppm, est, exact, err). */
  def quantiles(hist: Map[Long, Long], qPpms: Seq[Long],
                bins: Int): Seq[(Long, Long, Long, Long)] = {
    require(hist.nonEmpty, "empty histogram")
    val mn = hist.keys.min
    val mx = hist.keys.max
    val n = hist.values.sum
    val r = mx - mn + 1
    val byValue = hist.toSeq.sortBy(_._1)
    val byBin = hist.toSeq
      .groupMapReduce { case (x, _) => (x - mn) * bins / r }(_._2)(_ + _)
      .toSeq.sortBy(_._1)
    qPpms.map { q =>
      val kidx = (q * n + 999999) / 1000000
      var cb = 0L
      val qbin = byBin.iterator
        .map { case (b, c) => cb += c; (b, cb) }
        .find(_._2 >= kidx).get._1
      var cv = 0L
      val exact = byValue.iterator
        .map { case (x, c) => cv += c; (x, cv) }
        .find(_._2 >= kidx).get._1
      val est = mn + ((qbin + 1) * r + bins - 1) / bins - 1
      (q, est, exact, est - exact)
    }
  }
}
