package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable time-gap sessionization (batch form of the reference's greedy
  * online clustering with the simple time criterion — reference
  * src/analysis/coincidencefilter.cpp:94-143 + simplecoincidence.cpp:12-15;
  * canonical deterministic semantics per SURVEY.md §7.3: a cluster is a
  * maximal run of time-ordered events with consecutive gaps ≤ gapNs).
  *
  * Design for 100 TB: a naive global `Window.orderBy(start)` serializes the
  * whole table through one partition. Instead:
  *
  *   1. bucket events by `floor(start / bucketNs)` (bucketNs >> gapNs) and
  *      sessionize per bucket with an ordinary partitioned window;
  *   2. sessions can only merge across bucket boundaries via each bucket's
  *      FIRST and LAST session — within a bucket, consecutive sessions are
  *      > gapNs apart by construction, so a bucket's first and last session
  *      never chain to each other through the boundary pass;
  *   3. run the same gap rule over that O(#buckets)-row boundary set on a
  *      single partition (tiny), producing a merge map that is broadcast
  *      back.
  *
  * Total cost: one shuffle on bucket, one broadcast join — no global sort,
  * no driver-side collect of event data.
  */
object Sessionize {

  /** Adds `cluster_key` (= min start_ns of the cluster, a stable canonical
    * id) to `hits`. Requires columns `start_ns: Long` and a unique
    * `event_id: Long` tiebreak. */
  def withClusterKey(hits: DataFrame, gapNs: Long,
                     bucketNs: Long = 3600L * 1000000000L): DataFrame = {
    require(bucketNs > gapNs, "bucket must exceed the session gap")
    val b = hits.withColumn("_bucket", floor(col("start_ns") / bucketNs))

    val wB = Window.partitionBy("_bucket").orderBy("start_ns", "event_id")
    val local = b
      .withColumn("_prev", lag(col("start_ns"), 1).over(wB))
      .withColumn("_nb",
        when(col("_prev").isNull || col("start_ns") - col("_prev") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("_sess", sum("_nb").over(
        wB.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev", "_nb")

    val sess = local.groupBy("_bucket", "_sess")
      .agg(min("start_ns").as("_smin"), max("start_ns").as("_smax"))

    // Boundary sessions: first and last of each bucket (2 rows per bucket).
    val wSessCount = Window.partitionBy("_bucket")
    val boundary = sess
      .withColumn("_maxSess", max("_sess").over(wSessCount))
      .filter(col("_sess") === 1L || col("_sess") === col("_maxSess"))
      .drop("_maxSess")
      .distinct()

    // Chain-merge the (tiny) boundary set with the same gap rule on one
    // partition; cluster key = min _smin over the chain.
    val wAll = Window.partitionBy(lit(1)).orderBy("_smin", "_bucket", "_sess")
    val merged = boundary.repartition(1)
      .withColumn("_prevMax", lag(col("_smax"), 1).over(wAll))
      .withColumn("_nb",
        when(col("_prevMax").isNull || col("_smin") - col("_prevMax") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("_chain", sum("_nb").over(
        wAll.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cluster_key",
        min("_smin").over(Window.partitionBy("_chain")))
      .select("_bucket", "_sess", "cluster_key")

    // Non-boundary sessions keep their own _smin as the cluster key.
    local
      .join(broadcast(merged), Seq("_bucket", "_sess"), "left")
      .withColumn("_ownKey", min("start_ns").over(
        Window.partitionBy("_bucket", "_sess")))
      .withColumn("cluster_key", coalesce(col("cluster_key"), col("_ownKey")))
      .drop("_bucket", "_sess", "_ownKey")
  }
}
