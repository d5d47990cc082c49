package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Detector-network analytics (SURVEY.md §2.2–§2.5) over the `events`
  * table mapped onto the hit stream: `user_id` = station key, `ts` = event
  * time in raw i64 nanoseconds (Tables.events reads nanos-as-long).
  *
  * Clustering uses the canonical deterministic batch semantics (SURVEY.md
  * §7.3): a coincidence cluster is a maximal run of time-ordered events
  * with consecutive gaps ≤ GapNs (the simple criterion,
  * reference src/analysis/simplecoincidence.cpp:12-15, scaled to this
  * dataset's event cadence), envelope-merged per reference
  * src/messages/event.cpp:23-44, with `true_e` = count of valid pair edges
  * and `conflicting` = a station appearing twice (reference
  * src/analysis/coincidencefilter.cpp:94-143, criterion.cpp:7-57).
  */
object Detector {

  /** Session gap (ns): the simple-criterion window scaled to the synthetic
    * event cadence (30 s — the reference's 100 µs window at ~Hz hit rates
    * corresponds to the same occupancy at this table's ~minute spacing). */
  final val GapNs: Long = 30L * 1000000000L

  /** Time-bucket width for distributed sessionization (>> GapNs). */
  final val BucketNs: Long = 3600L * 1000000000L

  /** Pair-histogram bin width (ns): 1 s. */
  final val BinNs: Double = 1e9

  /** Timebase clamp bounds, ns (reference include/supervision/timebase.h:38-40). */
  final val BaseMinNs: Long = 800000000L
  final val BaseMaxNs: Long = 120L * 1000000000L

  /** Dynamic cluster-timeout clamp, ns (reference
    * include/messages/event.h:16-17: 2 s minimum, 30 min maximum). */
  final val TimeoutMinNs: Long = 2L * 1000000000L
  final val TimeoutMaxNs: Long = 1800L * 1000000000L

  /** events → canonical hit columns. The engine's canonical time is i64
    * nanos; for oracle parity the nanos are truncated to µs precision here
    * because DuckDB (1.0) reads parquet TIMESTAMP_NS as µs TIMESTAMP. */
  private def hits(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id"), col("user_id").as("station"),
      (expr("ts div 1000") * 1000).as("start_ns"))  // integer div: 1.7e18 exceeds double's 2^53

  /** Sessionized hits, branched off the SHARED persisted sessionize in
    * [[Geodesic]] (same gap/bucket, same hit projection — the extra ECEF
    * columns are dropped here): one sessionize shuffle serves both the
    * simple-criterion and the geodesic coincidence families per session. */
  private def clustered(s: SparkSession, dir: String): DataFrame =
    Geodesic.sessionedForSinks(s, dir)
      .select("event_id", "station", "start_ns", "cluster_key")

  /** One row per cluster with the (start-sorted) hit array — a SINGLE
    * scan + shuffle for the whole coincidence family; pair math happens
    * with higher-order array functions on gap-bounded arrays instead of a
    * second sessionize + self-join branch (the naive plan scanned the
    * parquet four times).
    *
    * PERSISTED per (session, dir): four queries consume this aggregate
    * (coincidence_l1, plausibility_ring, pair_timediff_hist,
    * multiplicity_hist), and within one Verify/Bench run the scan +
    * sessionize + collect_list shuffle now runs once instead of four
    * times. Cluster rows are ~3 orders smaller than the event scan, so
    * the cached footprint is negligible. */
  private def clusterAgg(s: SparkSession, dir: String): DataFrame =
    ScanCache.get(s, s"cluster-agg:$dir") {
      clustered(s, dir)
        .groupBy("cluster_key")
        .agg(sort_array(collect_list(struct(
          col("start_ns"), col("event_id"), col("station")))).as("hits"))
        .withColumn("n", size(col("hits")).cast("long"))
    }

  /** All unordered in-cluster pairs (i < j over the sorted hit array),
    * exploded — the batch form of the reference's per-cluster pair loops
    * (criterion.cpp:33-44, stationcoincidence.cpp:43-80). */
  private def pairsExpr: String =
    "flatten(transform(sequence(1, size(hits) - 1), i -> " +
      "transform(slice(hits, cast(i + 1 AS int), size(hits) - cast(i AS int)), " +
      "y -> struct(element_at(hits, cast(i AS int)) AS a, y AS b))))"

  /** L1 coincidence events (n ≥ 2): envelope, multiplicity, conflicting
    * flag, valid-edge count and plausibility — the O2/O3 sink shape
    * (reference include/sink/database.h:135-165). */
  private def coincidenceL1(s: SparkSession, dir: String): DataFrame =
    clusterAgg(s, dir)
      .filter(col("n") >= 2)
      .selectExpr("n",
        "element_at(hits, 1).start_ns AS cluster_start",
        "element_at(hits, cast(n AS int)).start_ns AS cluster_end",
        "size(array_distinct(transform(hits, h -> h.station))) AS _ndist",
        s"size(filter($pairsExpr, " +
          s"p -> abs(p.a.start_ns - p.b.start_ns) <= ${GapNs}L)) AS _te")
      .select(
        col("cluster_start"), col("cluster_end"), col("n"),
        (col("n") > col("_ndist")).as("conflicting"),
        col("_te").cast("long").as("true_e"),
        (col("_te") / (col("n") * (col("n") - 1) / lit(2.0)))
          .as("plausibility"))
      .orderBy("cluster_start")

  /** Station-pair time-difference histogram (reference
    * src/analysis/stationcoincidence.cpp:43-80): for every unordered
    * station pair inside a coincidence, Δstart sign-normalized with the
    * larger station key first, 1 s bins. */
  private def pairTimediffHist(s: SparkSession, dir: String): DataFrame =
    clusterAgg(s, dir)
      .filter(col("n") >= 2)
      .selectExpr(s"explode($pairsExpr) AS p")
      .filter(col("p.a.station") =!= col("p.b.station"))
      .select(
        least(col("p.a.station"), col("p.b.station")).as("station_lo"),
        greatest(col("p.a.station"), col("p.b.station")).as("station_hi"),
        when(col("p.a.station") > col("p.b.station"),
          col("p.a.start_ns") - col("p.b.start_ns"))
          .otherwise(col("p.b.start_ns") - col("p.a.start_ns")).as("_dt"))
      .withColumn("bin", floor(col("_dt") / BinNs).cast("long"))
      .groupBy("station_lo", "station_hi", "bin")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("station_lo", "station_hi", "bin")

  /** Multiplicity histogram of emitted coincidences (reference
    * src/supervision/state.cpp:113-126; n=1 suppressed as at every sink). */
  private def multiplicityHist(s: SparkSession, dir: String): DataFrame =
    clusterAgg(s, dir)
      .filter(col("n") >= 2)
      .groupBy("n").agg(count(lit(1)).as("n_clusters"))
      .orderBy("n")

  /** Timebase sampling (reference src/supervision/timebase.cpp:27-45):
    * per 10-minute window, event-time spread clamped to [0.8 s, 2 min]. */
  private def timebase(s: SparkSession, dir: String): DataFrame =
    hits(s, dir)
      .withColumn("w", floor(col("start_ns") / (600L * 1000000000L)))
      .groupBy("w")
      .agg(count(lit(1)).as("n_events"),
           (max("start_ns") - min("start_ns")).as("spread_ns"))
      .withColumn("base_ns",
        greatest(least(col("spread_ns"), lit(BaseMaxNs)), lit(BaseMinNs)))
      .orderBy("w")

  /** A2 last-100 ring: mean plausibility over the last 100 emitted
    * coincidences (reference src/supervision/state.cpp:127-130 ring).
    * The ring is a GLOBAL sequential state in the reference (one cluster
    * process), so the window is unpartitioned — cardinality here is
    * emitted clusters (orders of magnitude below events), not the event
    * stream, so the single-partition window is not a scale hazard.
    * Fixed-point (floor·1e6) sums keep both engines order-exact. */
  private def plausibilityRing(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("cluster_start").rowsBetween(-99, 0)
    coincidenceL1(s, dir)
      .select(col("cluster_start"), col("plausibility"))
      .withColumn("p6m", floor(col("plausibility") * 1000000).cast("long"))
      .select(col("cluster_start"),
        (sum("p6m").over(w) / 1000000.0 / count(lit(1)).over(w))
          .as("ring_mean"))
      .orderBy("cluster_start")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "coincidence_l1"     -> coincidenceL1 _,
    "plausibility_ring"  -> plausibilityRing _,
    "pair_timediff_hist" -> pairTimediffHist _,
    "multiplicity_hist"  -> multiplicityHist _,
    "timebase"           -> timebase _
  )

  def oracleSql: Map[String, String] = {
    val gap = GapNs.toString
    val sessionCte =
      s"""WITH h AS (
         |  SELECT event_id, user_id AS station, epoch_ns(ts) AS start_ns
         |  FROM events),
         |s AS (
         |  SELECT *, CASE WHEN lag(start_ns) OVER w IS NULL
         |    OR start_ns - lag(start_ns) OVER w > $gap THEN 1 ELSE 0 END AS nb
         |  FROM h WINDOW w AS (ORDER BY start_ns, event_id)),
         |c AS (
         |  SELECT event_id, station, start_ns,
         |    sum(nb) OVER (ORDER BY start_ns, event_id
         |                  ROWS UNBOUNDED PRECEDING) AS cid
         |  FROM s)""".stripMargin
    Map(
      "plausibility_ring" -> {
        val base =
          s"""$sessionCte,
             |agg AS (
             |  SELECT cid, min(start_ns) AS cluster_start, count(*) AS n
             |  FROM c GROUP BY cid),
             |pairs AS (
             |  SELECT a.cid, count(*) AS te FROM c a JOIN c b
             |    ON a.cid = b.cid AND a.event_id < b.event_id
             |   AND abs(a.start_ns - b.start_ns) <= $gap
             |  GROUP BY a.cid),
             |l1 AS (
             |  SELECT cluster_start,
             |    coalesce(te, 0) / (n * (n - 1) / 2.0) AS plausibility
             |  FROM agg LEFT JOIN pairs USING (cid) WHERE n >= 2)""".stripMargin
        s"""$base
           |SELECT cluster_start,
           |  sum(CAST(floor(plausibility * 1000000) AS BIGINT)) OVER w
           |    / 1000000.0 / count(*) OVER w AS ring_mean
           |FROM l1
           |WINDOW w AS (ORDER BY cluster_start
           |  ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)
           |ORDER BY cluster_start""".stripMargin
      },
      "coincidence_l1" ->
        s"""$sessionCte,
           |agg AS (
           |  SELECT cid, min(start_ns) AS cluster_start,
           |    max(start_ns) AS cluster_end, count(*) AS n,
           |    count(DISTINCT station) AS ndist
           |  FROM c GROUP BY cid),
           |pairs AS (
           |  SELECT a.cid, count(*) AS te FROM c a JOIN c b
           |    ON a.cid = b.cid AND a.event_id < b.event_id
           |   AND abs(a.start_ns - b.start_ns) <= $gap
           |  GROUP BY a.cid)
           |SELECT cluster_start, cluster_end, n, (n > ndist) AS conflicting,
           |  coalesce(te, 0) AS true_e,
           |  coalesce(te, 0) / (n * (n - 1) / 2.0) AS plausibility
           |FROM agg LEFT JOIN pairs USING (cid)
           |WHERE n >= 2 ORDER BY cluster_start""".stripMargin,
      "pair_timediff_hist" ->
        s"""$sessionCte
           |SELECT least(a.station, b.station) AS station_lo,
           |  greatest(a.station, b.station) AS station_hi,
           |  CAST(floor((CASE WHEN a.station > b.station
           |    THEN a.start_ns - b.start_ns
           |    ELSE b.start_ns - a.start_ns END) / 1000000000.0) AS BIGINT) AS bin,
           |  count(*) AS cnt
           |FROM c a JOIN c b
           |  ON a.cid = b.cid AND a.event_id < b.event_id
           | AND a.station <> b.station
           |GROUP BY 1, 2, 3 ORDER BY station_lo, station_hi, bin""".stripMargin,
      "multiplicity_hist" ->
        s"""$sessionCte
           |SELECT n, count(*) AS n_clusters FROM (
           |  SELECT cid, count(*) AS n FROM c GROUP BY cid)
           |WHERE n >= 2 GROUP BY n ORDER BY n""".stripMargin,
      "timebase" ->
        s"""SELECT epoch_ns(ts) // 600000000000 AS w, count(*) AS n_events,
           |  max(epoch_ns(ts)) - min(epoch_ns(ts)) AS spread_ns,
           |  greatest(least(max(epoch_ns(ts)) - min(epoch_ns(ts)),
           |    ${BaseMaxNs}), ${BaseMinNs}) AS base_ns
           |FROM events GROUP BY 1 ORDER BY w""".stripMargin
    )
  }
}
