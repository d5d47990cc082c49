package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One token occurrence's poly-hash fold on the ingest stream. */
case class CmsTok(h: Long)

/** Streaming twin of the count-min sketch build (`cms_heavy_hitters`):
  * the (row, bucket) counter table maintained incrementally. CMS state
  * is additive — each occurrence increments d cells and cells merge by
  * BIGINT addition — so the twin is a plain update-mode streaming
  * aggregation over the d·w cell key space: no custom stateful
  * operator, map-side partial aggregation per micro-batch, and the
  * persisted aggregation state IS the sketch (2048 counters total,
  * independent of stream length). Estimates read the same min-over-rows
  * arithmetic as the batch query, shared here with the spec. */
object StreamingCms {

  /** Running (r, b) counter table. Run with `outputMode("update")`;
    * the last emitted row per cell is its live count. */
  def cmsStream(toks: Dataset[CmsTok], d: Int, w: Int, muls: Seq[Long],
      p: Long): DataFrame = {
    val cells = muls.take(d).zipWithIndex.map { case (m, i) =>
      s"named_struct('r', ${i}L, 'b', h % ${p}L * ${m}L % ${p}L % $w)" }
    toks.toDF()
      .selectExpr(s"explode(array(${cells.mkString(", ")})) AS cell")
      .groupBy(col("cell.r").as("r"), col("cell.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimate for token-hash h: min over its d cells (absent cell
    * = 0 — the token was never seen). */
  def estimate(cells: Map[(Long, Long), Long], h: Long, muls: Seq[Long],
      p: Long, w: Int): Long =
    muls.zipWithIndex.map { case (m, i) =>
      cells.getOrElse((i.toLong, h % p * m % p % w), 0L) }.min
}
