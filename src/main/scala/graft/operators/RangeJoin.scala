package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (bucketed) point-in-interval join — the scalable form of the
  * range join Spark would otherwise plan as a broadcast-nested-loop or
  * sort-merge over an inequality: intervals explode to the fixed-width
  * buckets they cover, points map to exactly one bucket, and the join is
  * a plain EQUI-join on (keys, bucket) followed by the precise containment
  * filter. A (point, interval) pair can only meet in the point's single
  * bucket, so no post-join dedup is needed. Cost scales with
  * Σ interval-span/bucket — bounded when the bucket width tracks typical
  * interval length (same reasoning as Sessionize's time buckets).
  */
object RangeJoin {

  /** Join rows of `points` to the rows of `intervals` whose
    * [startCol, endCol) range contains the point's `tCol`, equi-keyed on
    * `keyCols`. Empty/negative-span intervals are dropped (a descending
    * `sequence` would otherwise be generated). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      bucketWidth: Long, keyCols: Seq[String],
                      tCol: String, startCol: String,
                      endCol: String): DataFrame = {
    val pts = points.withColumn("_b", floor(col(tCol) / bucketWidth))
    val ivs = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_b", explode(sequence(
        floor(col(startCol) / bucketWidth),
        floor((col(endCol) - 1) / bucketWidth))))
    pts.join(ivs, keyCols :+ "_b")
      .filter(col(tCol) >= col(startCol) && col(tCol) < col(endCol))
      .drop("_b")
  }
}
