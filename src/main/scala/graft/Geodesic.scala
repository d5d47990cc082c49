package graft

import graft.functions.Criterion
import graft.operators.Sessionize
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geodesic (time-AND-space) coincidence detection — the reference's core
  * query (SURVEY.md §2.3): pairwise criterion C1 (WGS84 chord distance,
  * time-of-flight window; reference src/analysis/coincidence.cpp:14-27) and
  * transitive clustering C4 (reference coincidencefilter.cpp:94-143) in the
  * canonical batch form: connected components over the valid-pair graph,
  * evaluated inside gap-bounded sessions so component search never holds
  * unbounded state (SURVEY.md §7.3 cross-key partitioning).
  *
  * Station positions derive deterministically from the station key (a grid
  * around 50°N 10°E); the pairwise criterion for the `events` corpus uses a
  * scaled signal speed so time-of-flight windows are commensurate with the
  * table's event cadence — the operator itself is parameterized, and
  * `distance_matrix` exercises the true physical constants.
  *
  * ECEF coordinates are computed with built-in column expressions (sin/cos/
  * sqrt), keeping the whole pair-scoring pipeline inside whole-stage
  * codegen; Java's Math.sin/cos agree bit-for-bit with DuckDB's libm on
  * this grid (verified), so the oracle compares exactly.
  */
/** One session-scoped hit with precomputed ECEF coordinates. */
case class SessHit(cluster_key: Long, event_id: Long, station: Long,
                   start_ns: Long, x: Double, y: Double, z: Double)

/** One geodesic coincidence component (cluster) with its C3 cluster
  * score: all-pairs average criterion score (fixed-point summed for
  * order-independence), valid-edge count, and the Valid/Conflicting/
  * Invalid classification (reference src/analysis/criterion.cpp:46-55). */
case class GeoComp(cluster_start: Long, cluster_end: Long, n: Long,
                   n_stations: Long, conflicting: Boolean,
                   score_e9: Long, n_valid: Long, score_type: String)

object Geodesic {

  /** Scaled criterion for the events corpus. */
  final val SpeedMPerNs: Double = 1e-7            // "slow light": tof(2.2km) ≈ 22 s
  final val MinTofNs: Double = 5000000000.0       // 5 s floor  (C1 s_minimum_time)
  final val MaxTimeNs: Long = 60000000000L        // 60 s cut   (C1 s_maximum_time)

  // ---- deterministic station grid ------------------------------------

  private[graft] def stationLat(st: Column): Column = lit(50.0) + (st % 10) * lit(0.02)
  private[graft] def stationLon(st: Column): Column =
    lit(10.0) + (floor(st / 10) % 10) * lit(0.03)
  private[graft] def stationH(st: Column): Column = lit(100.0) + (st % 7) * lit(10.0)

  /** WGS84 geodetic → ECEF as column expressions (mirrors
    * functions.Geo.toEcef; term order matches the oracle SQL exactly). */
  private[graft] def withEcef(df: DataFrame): DataFrame = {
    val a = graft.functions.Geo.SemiMajorA
    val e2 = graft.functions.Geo.EccSq
    val latR = radians(col("lat")); val lonR = radians(col("lon"))
    val nn = lit(a) / sqrt(lit(1.0) - lit(e2) * sin(latR) * sin(latR))
    df.withColumn("x", (nn + col("h")) * cos(latR) * cos(lonR))
      .withColumn("y", (nn + col("h")) * cos(latR) * sin(lonR))
      .withColumn("z", (nn * (lit(1.0) - lit(e2)) + col("h")) * sin(latR))
  }

  private def hitsWithCoords(s: SparkSession, dir: String): DataFrame =
    withEcef(Tables.events(s, dir).select(
      col("event_id"), col("user_id").as("station"),
      (expr("ts div 1000") * 1000).as("start_ns"))
      .withColumn("lat", stationLat(col("station")))
      .withColumn("lon", stationLon(col("station")))
      .withColumn("h", stationH(col("station"))))

  /** PERSISTED per (session, dir): five queries branch off the sessioned
    * + ECEF scan (geo_edges, coincidence_geo, component_score,
    * pair_timediff_hist_tof, and the l1 sink formatters) — one scan +
    * sessionize shuffle per Verify/Bench run instead of one per query. */
  private def sessioned(s: SparkSession, dir: String): DataFrame =
    ScanCache.get(s, s"geo-sessioned:$dir") {
      Sessionize.withClusterKey(hitsWithCoords(s, dir),
        Detector.GapNs, Detector.BucketNs)
    }

  /** Sessioned hits with grid coordinates, for sink-formatting queries. */
  private[graft] def sessionedForSinks(s: SparkSession, dir: String): DataFrame =
    sessioned(s, dir)

  private[graft] def pairDist(pre: String = ""): Column = {
    val dx = col("xa") - col("xb"); val dy = col("ya") - col("yb")
    val dz = col("za") - col("zb")
    sqrt(dx * dx + dy * dy + dz * dz)
  }

  /** Valid pair edges (score > 0 ⇔ Δt < ToF) inside sessions: the C1
    * criterion as a co-partitioned self-join — the session key bounds the
    * candidate set, so no O(N²) blowup at scale. */
  private def geoEdges(s: SparkSession, dir: String): DataFrame = {
    val c = sessioned(s, dir)
    val a = c.select(col("cluster_key"), col("event_id").as("eid_a"),
      col("start_ns").as("sa"), col("x").as("xa"), col("y").as("ya"),
      col("z").as("za"))
    val b = c.select(col("cluster_key"), col("event_id").as("eid_b"),
      col("start_ns").as("sb"), col("x").as("xb"), col("y").as("yb"),
      col("z").as("zb"))
    a.join(b, Seq("cluster_key"))
      .filter(col("eid_a") < col("eid_b"))
      .withColumn("delta_ns", abs(col("sa") - col("sb")))
      .withColumn("dist", pairDist())
      .filter(col("delta_ns") <= MaxTimeNs &&
        col("delta_ns") < greatest(col("dist") / SpeedMPerNs, lit(MinTofNs)))
      .select(col("eid_a"), col("eid_b"), col("delta_ns"),
        (floor(col("dist") * 1e6) / 1e6).as("dist_m"))
      .orderBy("eid_a", "eid_b")
  }

  // ---- connected components inside sessions ---------------------------

  /** Union-find over one session's hits (bounded by the session gap —
    * dozens of events, not millions). */
  private def components(hits: Array[SessHit]): Iterator[GeoComp] =
    componentsWithMembers(hits).map(_._1)

  /** [[components]] with each component's member hits attached (sorted by
    * event_id) — the composed detector DAG's sink formatters need the
    * per-member rows (streaming.DetectorApp). */
  private[graft] def componentsWithMembers(hits: Array[SessHit])
      : Iterator[(GeoComp, Seq[SessHit])] = {
    val n = hits.length
    val parent = Array.tabulate(n)(identity)
    def find(i: Int): Int = { var r = i; while (parent(r) != r) r = parent(r); var c = i
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }; r }
    def union(i: Int, j: Int): Unit = { val ri = find(i); val rj = find(j)
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj) }
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val a = hits(i); val b = hits(j)
        val delta = math.abs(a.start_ns - b.start_ns)
        if (delta <= MaxTimeNs) {
          val dx = a.x - b.x; val dy = a.y - b.y; val dz = a.z - b.z
          val dist = math.sqrt(dx * dx + dy * dy + dz * dz)
          if (delta.toDouble < math.max(dist / SpeedMPerNs, MinTofNs)) union(i, j)
        }
        j += 1
      }
      i += 1
    }
    hits.indices.groupBy(find).valuesIterator.collect {
      case idx if idx.size >= 2 =>
        val hs = idx.map(hits)
        // C3 all-pairs score (criterion.cpp:33-44): every unordered pair,
        // score fixed-pointed (floor·1e9) so the sum is order-independent
        // and the SQL oracle reproduces it exactly.
        var sumE9 = 0L
        var valid = 0L
        for (ii <- hs.indices; jj <- ii + 1 until hs.size) {
          val a = hs(ii); val b = hs(jj)
          val delta = math.abs(a.start_ns - b.start_ns).toDouble
          val sc =
            if (delta > MaxTimeNs) -1.0
            else {
              val dx = a.x - b.x; val dy = a.y - b.y; val dz = a.z - b.z
              val dist = math.sqrt(dx * dx + dy * dy + dz * dz)
              math.max(1.0 - delta / math.max(dist / SpeedMPerNs, MinTofNs), -1.0)
            }
          sumE9 += math.floor(sc * 1e9).toLong
          if (sc > 0.0) valid += 1
        }
        val nPairs = hs.size.toLong * (hs.size - 1) / 2
        val avg = sumE9 / 1e9 / nPairs
        val tpe =
          if (avg < Criterion.MaxFalse) "invalid"
          else if (avg > Criterion.MinTrue && valid == nPairs) "valid"
          else "conflicting"
        (GeoComp(hs.map(_.start_ns).min, hs.map(_.start_ns).max,
          hs.size.toLong, hs.map(_.station).distinct.size.toLong,
          hs.size > hs.map(_.station).distinct.size,
          sumE9, valid, tpe), hs)
    }
  }

  /** L1 coincidences under the geodesic criterion: connected components of
    * the valid-pair graph, per session (n ≥ 2 only, as at every reference
    * sink). */
  private def geoComps(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    sessioned(s, dir)
      .select("cluster_key", "event_id", "station", "start_ns", "x", "y", "z")
      .as[SessHit]
      .groupByKey(_.cluster_key)
      .flatMapGroups((_: Long, it: Iterator[SessHit]) =>
        components(it.toArray.sortBy(_.event_id)))
      .toDF()
  }

  private def coincidenceGeo(s: SparkSession, dir: String): DataFrame =
    geoComps(s, dir)
      .select("cluster_start", "cluster_end", "n", "n_stations", "conflicting")
      .orderBy("cluster_start", "cluster_end", "n")

  /** C3 cluster-score classification per geodesic component (reference
    * criterion.cpp:46-55 thresholds −0.3 / 0.5 with the all-valid gate). */
  private def componentScore(s: SparkSession, dir: String): DataFrame =
    geoComps(s, dir)
      .withColumn("avg_score",
        col("score_e9") / 1e9 / (col("n") * (col("n") - 1) / lit(2.0)))
      .select("cluster_start", "cluster_end", "n", "n_valid", "avg_score",
        "score_type")
      .orderBy("cluster_start", "cluster_end", "n")

  /** Station distance matrix with the TRUE physical constants (reference
    * include/analysis/coincidence.h:25-27): chord distance and
    * time-of-flight floor over every station pair. */
  /** A5 ToF binning constants (reference
    * src/analysis/stationcoincidence.cpp:232-236): 2000 bins centered on
    * 0; per-pair width clamp(2·tof/bins, min, max) where max =
    * total_width/bins and total_width = 2·MaxTimeNs (the reference's
    * 200 µs total at its 100 µs window, scaled to this corpus's window),
    * min = max/100 (the reference's 1 ns at a 100 ns cap). */
  final val TofBins = 2000
  final val TofMaxWidthNs: Double = 2.0 * MaxTimeNs / TofBins
  final val TofMinWidthNs: Double = TofMaxWidthNs / 100.0

  /** A5: per-pair Δt histogram with DATA-DEPENDENT bin width — each
    * station pair's width scales with its chord-distance time-of-flight
    * (clamped), so nearby pairs get fine bins and distant pairs coarse
    * ones; out-of-range samples land in the ±(bins/2) boundary bins.
    * Positions derive from the station key, so the width is computed
    * inline per pair row (codegen scalar math — no extra join/shuffle;
    * the only shuffle is the final groupBy on the pair key). */
  private def pairTimediffHistTof(s: SparkSession, dir: String): DataFrame = {
    val c = sessioned(s, dir)
    val a = c.select(col("cluster_key"), col("event_id").as("eid_a"),
      col("station").as("st_a"), col("start_ns").as("sa"),
      col("x").as("xa"), col("y").as("ya"), col("z").as("za"))
    val b = c.select(col("cluster_key"), col("event_id").as("eid_b"),
      col("station").as("st_b"), col("start_ns").as("sb"),
      col("x").as("xb"), col("y").as("yb"), col("z").as("zb"))
    a.join(b, Seq("cluster_key"))
      .filter(col("eid_a") < col("eid_b") && col("st_a") =!= col("st_b"))
      .withColumn("bw", floor(least(greatest(
          lit(2.0) * (pairDist() / lit(SpeedMPerNs)) / lit(TofBins.toDouble),
          lit(TofMinWidthNs)), lit(TofMaxWidthNs))))
      .withColumn("dt",
        when(col("st_a") > col("st_b"), col("sa") - col("sb"))
          .otherwise(col("sb") - col("sa")))
      .withColumn("bin", least(greatest(floor(col("dt") / col("bw")),
        lit(-(TofBins / 2).toLong)), lit((TofBins / 2 - 1).toLong)))
      .groupBy(least(col("st_a"), col("st_b")).as("station_lo"),
        greatest(col("st_a"), col("st_b")).as("station_hi"),
        col("bw").as("bin_width"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("station_lo", "station_hi", "bin")
  }

  private def distanceMatrix(s: SparkSession, dir: String): DataFrame = {
    val st = Tables.events(s, dir).select(col("user_id").as("station"))
      .distinct()
      .withColumn("lat", stationLat(col("station")))
      .withColumn("lon", stationLon(col("station")))
      .withColumn("h", stationH(col("station")))
    val e = withEcef(st)
    val a = e.select(col("station").as("st_a"), col("x").as("xa"),
      col("y").as("ya"), col("z").as("za"))
    val b = e.select(col("station").as("st_b"), col("x").as("xb"),
      col("y").as("yb"), col("z").as("zb"))
    a.join(b, col("st_a") < col("st_b"))
      .withColumn("dist", pairDist())
      .select(col("st_a"), col("st_b"),
        (floor(col("dist") * 1e6) / 1e6).as("dist_m"),
        (floor(greatest(col("dist") / Criterion.CMetersPerNano,
          lit(Criterion.MinTofNanos)) * 1e6) / 1e6).as("tof_ns"),
        (col("dist") <= Criterion.MaxDistanceMeters).as("in_range"))
      .orderBy("st_a", "st_b")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo_edges"       -> geoEdges _,
    "coincidence_geo" -> coincidenceGeo _,
    "component_score" -> componentScore _,
    "distance_matrix" -> distanceMatrix _,
    "pair_timediff_hist_tof" -> pairTimediffHistTof _
  )

  // ---- oracles ---------------------------------------------------------

  private val A = graft.functions.Geo.SemiMajorA
  private val E2 = graft.functions.Geo.EccSq

  /** Shared SQL: events with station grid coords and ECEF. */
  private def ecefCte: String =
    s"""WITH g AS (
       |  SELECT event_id, user_id AS station, epoch_ns(ts) AS start_ns,
       |    50.0 + (user_id % 10) * 0.02 AS lat,
       |    10.0 + ((user_id // 10) % 10) * 0.03 AS lon,
       |    100.0 + (user_id % 7) * 10.0 AS h
       |  FROM events),
       |h AS (
       |  SELECT event_id, station, start_ns,
       |    ($A / sqrt(1.0 - $E2 * sin(radians(lat)) * sin(radians(lat))) + h)
       |      * cos(radians(lat)) * cos(radians(lon)) AS x,
       |    ($A / sqrt(1.0 - $E2 * sin(radians(lat)) * sin(radians(lat))) + h)
       |      * cos(radians(lat)) * sin(radians(lon)) AS y,
       |    ($A / sqrt(1.0 - $E2 * sin(radians(lat)) * sin(radians(lat)))
       |      * (1.0 - $E2) + h) * sin(radians(lat)) AS z
       |  FROM g),
       |s AS (
       |  SELECT *, CASE WHEN lag(start_ns) OVER w IS NULL
       |    OR start_ns - lag(start_ns) OVER w > ${Detector.GapNs}
       |    THEN 1 ELSE 0 END AS nb
       |  FROM h WINDOW w AS (ORDER BY start_ns, event_id)),
       |c AS (
       |  SELECT event_id, station, start_ns, x, y, z,
       |    sum(nb) OVER (ORDER BY start_ns, event_id
       |                  ROWS UNBOUNDED PRECEDING) AS cid
       |  FROM s)""".stripMargin

  private[graft] val edgeCond =
    s"""abs(a.start_ns - b.start_ns) <= ${MaxTimeNs}
       | AND abs(a.start_ns - b.start_ns) < greatest(
       |   sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       |        + (a.z - b.z) * (a.z - b.z)) / ${SpeedMPerNs},
       |   ${MinTofNs})""".stripMargin

  private[graft] val scoreSql =
    s"""CASE WHEN abs(a.start_ns - b.start_ns) > ${MaxTimeNs} THEN -1.0
       | ELSE greatest(1.0 - abs(a.start_ns - b.start_ns) / greatest(
       |   sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       |        + (a.z - b.z) * (a.z - b.z)) / ${SpeedMPerNs},
       |   ${MinTofNs}), -1.0) END""".stripMargin

  /** Grid-coordinate `g` CTE body over the raw events table (the default
    * input of the geo family; the composed DAG substitutes its gated set). */
  private[graft] def defaultGeoG: String =
    s"""SELECT event_id, user_id AS station, epoch_ns(ts) AS start_ns,
       |    50.0 + (user_id % 10) * 0.02 AS lat,
       |    10.0 + ((user_id // 10) % 10) * 0.03 AS lon,
       |    100.0 + (user_id % 7) * 10.0 AS h
       |  FROM events""".stripMargin

  /** The geo component chain AFTER a `g(event_id, station, start_ns,
    * lat, lon, h)` CTE: ECEF → gap sessions → valid-edge graph →
    * recursive connected components (`comp(node, comp)`). Parameterized
    * so the composed detector DAG (streaming.DetectorApp) can run the
    * identical pipeline over its GATED event set. */
  private[graft] def geoChainCtes: String =
    s"""h AS (
       |  SELECT event_id, station, start_ns,
       |    ($A / sqrt(1.0 - $E2 * sin(radians(lat)) * sin(radians(lat))) + h)
       |      * cos(radians(lat)) * cos(radians(lon)) AS x,
       |    ($A / sqrt(1.0 - $E2 * sin(radians(lat)) * sin(radians(lat))) + h)
       |      * cos(radians(lat)) * sin(radians(lon)) AS y,
       |    ($A / sqrt(1.0 - $E2 * sin(radians(lat)) * sin(radians(lat)))
       |      * (1.0 - $E2) + h) * sin(radians(lat)) AS z
       |  FROM g),
       |s AS (
       |  SELECT *, CASE WHEN lag(start_ns) OVER w IS NULL
       |    OR start_ns - lag(start_ns) OVER w > ${Detector.GapNs}
       |    THEN 1 ELSE 0 END AS nb
       |  FROM h WINDOW w AS (ORDER BY start_ns, event_id)),
       |c AS (
       |  SELECT event_id, station, start_ns, x, y, z,
       |    sum(nb) OVER (ORDER BY start_ns, event_id
       |                  ROWS UNBOUNDED PRECEDING) AS cid
       |  FROM s),
       |e AS (
       |  SELECT a.event_id AS src, b.event_id AS dst
       |  FROM c a JOIN c b ON a.cid = b.cid AND a.event_id <> b.event_id
       |  WHERE $edgeCond),
       |reach(node, lbl) AS (
       |  SELECT event_id, event_id FROM c
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN e ON r.node = e.src
       |  WHERE r.lbl < e.dst),
       |comp AS (SELECT node, min(lbl) AS comp FROM reach GROUP BY node)""".stripMargin

  /** The n ≥ 2 component-envelope SELECT over `c` + `comp` (the
    * coincidence_geo final stage; shared with the composed DAG oracle). */
  private[graft] def geoClusterSelect: String =
    s"""SELECT min(start_ns) AS cluster_start, max(start_ns) AS cluster_end,
       |  count(*) AS n, count(DISTINCT station) AS n_stations,
       |  (count(*) > count(DISTINCT station)) AS conflicting
       |FROM c JOIN comp ON c.event_id = comp.node
       |GROUP BY comp HAVING count(*) >= 2
       |ORDER BY cluster_start, cluster_end, n""".stripMargin

  /** Shared oracle prefix: grid coords → ECEF → sessions → valid-edge
    * graph → recursive connected components (`comp(node, comp)`). */
  private def oracleGeoCommon: String =
    s"""WITH RECURSIVE g AS (
       |  $defaultGeoG),
       |$geoChainCtes""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "pair_timediff_hist_tof" ->
      s"""$ecefCte,
         |p AS (
         |  SELECT least(a.station, b.station) AS station_lo,
         |    greatest(a.station, b.station) AS station_hi,
         |    CAST(floor(least(greatest(
         |      2.0 * (sqrt((a.x - b.x) * (a.x - b.x)
         |        + (a.y - b.y) * (a.y - b.y)
         |        + (a.z - b.z) * (a.z - b.z)) / ${SpeedMPerNs})
         |        / ${TofBins.toDouble},
         |      ${TofMinWidthNs}), ${TofMaxWidthNs})) AS BIGINT) AS bin_width,
         |    CASE WHEN a.station > b.station THEN a.start_ns - b.start_ns
         |         ELSE b.start_ns - a.start_ns END AS dt
         |  FROM c a JOIN c b ON a.cid = b.cid AND a.event_id < b.event_id
         |  WHERE a.station <> b.station)
         |SELECT station_lo, station_hi, bin_width,
         |  least(greatest(CAST(floor(dt / bin_width) AS BIGINT),
         |    ${-(TofBins / 2)}), ${TofBins / 2 - 1}) AS bin,
         |  count(*) AS cnt
         |FROM p GROUP BY 1, 2, 3, 4
         |ORDER BY station_lo, station_hi, bin""".stripMargin,
    "geo_edges" ->
      s"""$ecefCte
         |SELECT a.event_id AS eid_a, b.event_id AS eid_b,
         |  abs(a.start_ns - b.start_ns) AS delta_ns,
         |  floor(sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
         |    + (a.z - b.z) * (a.z - b.z)) * 1e6) / 1e6 AS dist_m
         |FROM c a JOIN c b ON a.cid = b.cid AND a.event_id < b.event_id
         |WHERE $edgeCond
         |ORDER BY eid_a, eid_b""".stripMargin,
    "coincidence_geo" ->
      s"""$oracleGeoCommon
         |$geoClusterSelect""".stripMargin,
    // pair CTE joins comp=comp BEFORE the id inequality (see
    // DetectorApp.oracleSql: the inequality-first shape made DuckDB
    // run an O(n²) inequality join ahead of the component filter)
    "component_score" ->
      s"""$oracleGeoCommon,
         |p AS (
         |  SELECT ca.comp AS comp, $scoreSql AS sc
         |  FROM comp ca JOIN comp cb ON ca.comp = cb.comp
         |    AND ca.node < cb.node
         |  JOIN c a ON a.event_id = ca.node
         |  JOIN c b ON b.event_id = cb.node),
         |sc AS (
         |  SELECT comp, sum(CAST(floor(sc * 1e9) AS BIGINT)) AS se9,
         |    count(*) FILTER (sc > 0.0) AS nv
         |  FROM p GROUP BY comp),
         |ag AS (
         |  SELECT comp.comp AS comp, min(start_ns) AS cluster_start,
         |    max(start_ns) AS cluster_end, count(*) AS n
         |  FROM c JOIN comp ON c.event_id = comp.node
         |  GROUP BY comp.comp HAVING count(*) >= 2)
         |SELECT cluster_start, cluster_end, n, nv AS n_valid,
         |  se9 / 1e9 / (n * (n - 1) / 2.0) AS avg_score,
         |  CASE WHEN se9 / 1e9 / (n * (n - 1) / 2.0) < -0.3 THEN 'invalid'
         |    WHEN se9 / 1e9 / (n * (n - 1) / 2.0) > 0.5
         |      AND nv = n * (n - 1) // 2 THEN 'valid'
         |    ELSE 'conflicting' END AS score_type
         |FROM ag JOIN sc USING (comp)
         |ORDER BY cluster_start, cluster_end, n""".stripMargin,
    "distance_matrix" ->
      s"""WITH st AS (
         |  SELECT DISTINCT user_id AS station,
         |    50.0 + (user_id % 10) * 0.02 AS lat,
         |    10.0 + ((user_id // 10) % 10) * 0.03 AS lon,
         |    100.0 + (user_id % 7) * 10.0 AS h
         |  FROM events),
         |e AS (
         |  SELECT station,
         |    ($A / sqrt(1.0 - $E2 * sin(radians(lat)) * sin(radians(lat))) + h)
         |      * cos(radians(lat)) * cos(radians(lon)) AS x,
         |    ($A / sqrt(1.0 - $E2 * sin(radians(lat)) * sin(radians(lat))) + h)
         |      * cos(radians(lat)) * sin(radians(lon)) AS y,
         |    ($A / sqrt(1.0 - $E2 * sin(radians(lat)) * sin(radians(lat)))
         |      * (1.0 - $E2) + h) * sin(radians(lat)) AS z
         |  FROM st)
         |SELECT a.station AS st_a, b.station AS st_b,
         |  floor(sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
         |    + (a.z - b.z) * (a.z - b.z)) * 1e6) / 1e6 AS dist_m,
         |  floor(greatest(sqrt((a.x - b.x) * (a.x - b.x)
         |    + (a.y - b.y) * (a.y - b.y) + (a.z - b.z) * (a.z - b.z))
         |    / ${Criterion.CMetersPerNano}, ${Criterion.MinTofNanos}) * 1e6)
         |    / 1e6 AS tof_ns,
         |  (sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
         |    + (a.z - b.z) * (a.z - b.z)) <= ${Criterion.MaxDistanceMeters})
         |    AS in_range
         |FROM e a JOIN e b ON a.station < b.station
         |ORDER BY st_a, st_b""".stripMargin
  )
}
