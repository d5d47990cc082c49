package graft.streaming

import graft.Detector
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One hit on the stream (event time = startNs, i64 nanos). */
case class StreamHit(eventId: Long, station: Long, startNs: Long)

/** One open (not yet emitted) coincidence cluster. `timeoutNs` is the
  * cluster's emission deadline distance (T1 feedback): it starts at the
  * dynamic timeout current when the cluster opens and only ever GROWS
  * (reference src/analysis/eventconstructor.cpp:7-13 ignores smaller
  * values), so a timebase spike can hold a cluster open longer but a
  * later calm sample never retracts the wait. */
case class OpenCluster(minStart: Long, maxStart: Long,
                       stations: List[Long], eventIds: List[Long],
                       timeoutNs: Long = Detector.GapNs)

/** Keyed state: the open clusters of one time bucket. */
case class BucketState(clusters: List[OpenCluster])

/** An emitted coincidence cluster. Singletons ARE emitted (a bucket-
  * boundary singleton may merge into a neighbor during compaction);
  * sinks filter n ≥ 2, exactly as the reference's sinks do. `stations`
  * carries the constituent station keys (sorted, with duplicates) so
  * compaction can recompute distinctness exactly. */
case class EmittedCluster(clusterStart: Long, clusterEnd: Long, n: Long,
                          nStations: Long, conflicting: Boolean,
                          stations: List[Long])

/** Structured-Streaming coincidence clustering — the event-time lift of the
  * reference's greedy online filter (reference
  * src/analysis/coincidencefilter.cpp:94-143 buffers open clusters and
  * emits on timeout, reference :40-59): `flatMapGroupsWithState` keyed by
  * time bucket, clusters merged incrementally (an event bridging two open
  * clusters merges them — the transitive-closure behavior of C4), emission
  * driven by the event-time watermark instead of wall clock (SURVEY.md
  * §7.3: a deliberate upgrade — replays become reproducible).
  *
  * Scale: state is per-bucket and gap-bounded; no global buffer. Clusters
  * that touch a bucket boundary can be compacted by the same tiny
  * boundary-merge pass as the batch sessionizer (operators.Sessionize) in
  * a downstream foreachBatch; within-bucket output is exact.
  */
object StreamingCoincidence {

  /** T1 feedback (reference src/supervision/timebase.cpp:27-45 +
    * src/messages/event.cpp:7-11): `dynamicTimeout = true` makes each
    * micro-batch a timebase sample — base = clamp(event-time spread,
    * BaseMin, BaseMax), timeout = clamp(base × rateFactor, TimeoutMin,
    * TimeoutMax) — and seals a cluster only when the watermark passes
    * maxStart + its per-cluster (only-grow) timeout instead of
    * maxStart + gap. `rateFactor` is the reference's largest station
    * rate-dip factor (R10, src/supervision/station.cpp:74-79); it is a
    * parameter because in a deployment it arrives on a side channel
    * (the registry stream). Membership stays gap-based (the criterion
    * decides WHO joins; the timeout decides how long to WAIT — exactly
    * the reference's split), so emitted content is identical to the
    * static path; only emission timing adapts. */
  def clusterStream(hits: Dataset[StreamHit],
                    gapNs: Long = Detector.GapNs,
                    bucketNs: Long = Detector.BucketNs,
                    watermarkDelay: String = "30 seconds",
                    dynamicTimeout: Boolean = false,
                    rateFactor: Double = 1.0): Dataset[EmittedCluster] = {
    val spark = hits.sparkSession
    import spark.implicits._
    hits
      .withColumn("ts", timestamp_micros(expr("startNs div 1000")))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey { case (_, _, startNs, _) => startNs / bucketNs }
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        processBucket(gapNs, dynamicTimeout, rateFactor))
  }

  /** One timebase sample → dynamic timeout (never below the gap). */
  private[streaming] def dynTimeout(spreadNs: Long, rateFactor: Double,
                                    gapNs: Long): Long = {
    val base = math.max(Detector.BaseMinNs,
      math.min(Detector.BaseMaxNs, spreadNs))
    math.max(gapNs, math.min(Detector.TimeoutMaxNs,
      math.max(Detector.TimeoutMinNs, (base * rateFactor).toLong)))
  }

  /** Merge an event into the open-cluster set: every cluster whose
    * [min−gap, max+gap] envelope covers the event start is unioned with it
    * (maintains exact gap-session components under out-of-order arrival).
    * The merged cluster's timeout is the max of its constituents' and the
    * current dynamic timeout — only-grow. */
  private[streaming] def addEvent(clusters: List[OpenCluster], e: StreamHit,
                                  gapNs: Long,
                                  dynNs: Long = Detector.GapNs): List[OpenCluster] = {
    val (touching, rest) = clusters.partition(c =>
      e.startNs >= c.minStart - gapNs && e.startNs <= c.maxStart + gapNs)
    val merged = touching.foldLeft(
      OpenCluster(e.startNs, e.startNs, List(e.station), List(e.eventId),
        dynNs)) {
      (acc, c) =>
        OpenCluster(math.min(acc.minStart, c.minStart),
          math.max(acc.maxStart, c.maxStart),
          acc.stations ++ c.stations, acc.eventIds ++ c.eventIds,
          math.max(acc.timeoutNs, c.timeoutNs))
    }
    merged :: rest
  }

  private def emit(c: OpenCluster): EmittedCluster = {
    val nStations = c.stations.distinct.size.toLong
    EmittedCluster(c.minStart, c.maxStart, c.eventIds.size.toLong,
      nStations, c.eventIds.size > nStations, c.stations.sorted)
  }

  /** Bucket-boundary compaction (run inside foreachBatch, or over the
    * final output): clusters are keyed per time bucket, so a cluster
    * chain crossing a boundary is emitted as adjacent fragments. Sorted
    * by start, fragments merge when the gap rule holds across their
    * envelopes — the same session-level path-graph merge as the batch
    * sessionizer's boundary pass (operators.Sessionize). Pure function;
    * per micro-batch the fragment count is tiny. */
  def compactClusters(clusters: Seq[EmittedCluster],
                      gapNs: Long): Seq[EmittedCluster] = {
    if (clusters.isEmpty) return Nil
    val sorted = clusters.sortBy(c => (c.clusterStart, c.clusterEnd))
    val out = scala.collection.mutable.ArrayBuffer[EmittedCluster]()
    var cur = sorted.head
    for (c <- sorted.tail) {
      if (c.clusterStart - cur.clusterEnd <= gapNs) {
        val st = (cur.stations ++ c.stations).sorted
        val nd = st.distinct.size.toLong
        cur = EmittedCluster(cur.clusterStart,
          math.max(cur.clusterEnd, c.clusterEnd),
          cur.n + c.n, nd, cur.n + c.n > nd, st)
      } else { out += cur; cur = c }
    }
    out += cur
    out.toSeq
  }

  private def processBucket(gapNs: Long, dynamic: Boolean,
                            rateFactor: Double)(
      key: Long,
      events: Iterator[(Long, Long, Long, java.sql.Timestamp)],
      state: GroupState[BucketState]): Iterator[EmittedCluster] = {
    val wmNs = state.getCurrentWatermarkMs() * 1000000L
    var clusters = state.getOption.map(_.clusters).getOrElse(Nil)

    if (!state.hasTimedOut) {
      val batch = events.toSeq
      // this micro-batch is one timebase sample (the reference samples on
      // a processing cadence, timebase.cpp:27-33)
      val dynNs =
        if (!dynamic || batch.isEmpty) gapNs
        else {
          val starts = batch.map(_._3)
          dynTimeout(starts.max - starts.min, rateFactor, gapNs)
        }
      for ((eid, st, startNs, _) <- batch)
        clusters = addEvent(clusters, StreamHit(eid, st, startNs), gapNs,
          dynNs)
    }

    // Emit every cluster whose per-cluster deadline the watermark passed
    // (static path: timeoutNs == gapNs, byte-identical behavior).
    val (closed, open) = clusters.partition(c => c.maxStart + c.timeoutNs < wmNs)
    if (open.isEmpty) state.remove()
    else {
      state.update(BucketState(open))
      // earliest deadline among open clusters, strictly above the watermark
      val deadlineMs = open.map(c => c.maxStart + c.timeoutNs).min / 1000000L + 1
      state.setTimeoutTimestamp(math.max(deadlineMs,
        state.getCurrentWatermarkMs() + 1))
    }
    closed.sortBy(_.minStart).map(emit).iterator
  }
}
