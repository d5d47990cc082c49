package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One telemetry event for the registry (valueCents = fixed-point value). */
case class StationEvent(station: Long, startNs: Long, valueCents: Long,
                        counter: Long)

/** Persistent per-station state: running aggregates + reliability status
  * with hysteresis (the part batch queries cannot express — R6 keeps the
  * previous status inside the dead band; reference
  * src/analysis/detectorstation.cpp:89-107). */
case class StationState(nEvents: Long, sumValueCents: Long, lastCounter: Long,
                        progress: Long, lastSeenNs: Long, status: String,
                        reason: String = "miscellaneous",
                        lastWallMs: Long = 0L)

/** Registry output row (detector_summary shape, SURVEY §2.2 R11).
  * `reason` carries the detector_status::reason enum string of the last
  * status assignment (reference include/messages/detectorstatus.h:18-25);
  * `triggered` marks rows where the status CHANGED this batch — the R8/O7
  * trigger stream is `registryStream(...).filter(_.triggered)`, matching
  * set_status's emit-on-change (reference
  * src/analysis/detectorstation.cpp:71-77). */
case class StationUpdate(station: Long, nEvents: Long, meanValue: Double,
                         progress: Long, status: String,
                         reason: String = "miscellaneous",
                         triggered: Boolean = false)

/** Streaming station registry: `mapGroupsWithState` keyed by station hash —
  * the keyed-upsert + per-key aggregate machine of the reference's
  * supervision::station (SURVEY §2.2 R1–R8). Processing-time timeouts model
  * the liveness ladder (90 s unreliable / 270 s offline / 48 h delete,
  * reference include/analysis/detectorstation.h:123-125) — kept on
  * processing time deliberately, matching the reference's wall-clock
  * semantics for liveness (SURVEY §7.3 item 4).
  */
object StreamingRegistry {

  final val CounterMod = 65536L
  final val FTimeDivisor = 50.0
  final val UpperBand = 1.15
  final val LowerBand = 0.85
  /** R5 side effect (reference detectorstation.cpp:57-61): a single event
    * beyond the extreme-timing bound downgrades immediately. Fixed-point
    * cents of Registry's ExtremeValue = 300.0. */
  final val ExtremeCents = 30000L

  /** Liveness ladder deadlines (reference
    * include/analysis/detectorstation.h:123-125): 90 s to unreliable,
    * 270 s to offline, 48 h to deletion. */
  final val UnreliableMs = 90000L
  final val OfflineMs = 270000L
  final val DeleteMs = 48L * 3600 * 1000

  /** Pure ladder rule: status after `elapsedMs` of silence; None ⇒ the
    * station is deleted (state removed, reference station.cpp:84-87). */
  def livenessStatus(elapsedMs: Long, current: String): Option[String] =
    if (elapsedMs >= DeleteMs) None
    else if (elapsedMs >= OfflineMs) Some("offline")
    else if (elapsedMs >= UnreliableMs) Some("unreliable")
    else Some(current)

  /** `timeout = ProcessingTimeTimeout` enables the liveness ladder; pass
    * `NoTimeout` in synchronous tests — a processing-time timeout keeps the
    * micro-batch engine triggering empty batches, which stalls
    * processAllAvailable-style drivers. */
  def registryStream(events: Dataset[StationEvent],
                     livenessTimeoutMs: Long = 90000L,
                     timeout: GroupStateTimeout =
                       GroupStateTimeout.ProcessingTimeTimeout): Dataset[StationUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val arm = timeout != GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.station)
      .mapGroupsWithState(timeout)(update(livenessTimeoutMs, arm))
  }

  /** Fold one event into the state (u16 wraparound per reference
    * detectorstation.cpp:37-48, hysteresis classification per :89-107). */
  private[streaming] def fold(s: StationState, e: StationEvent): StationState = {
    val delta =
      if (s.nEvents == 0) 0L
      else if (e.counter > s.lastCounter) e.counter - s.lastCounter
      else e.counter + (CounterMod - 1) - s.lastCounter
    val n = s.nEvents + 1
    val sum = s.sumValueCents + e.valueCents
    val fTime = (sum / 100.0 / n) / FTimeDivisor
    val (status, reason) =
      if (e.valueCents > ExtremeCents) ("unreliable", "time_accuracy_extreme")
      else if (fTime > UpperBand) ("unreliable", "time_accuracy")
      else if (fTime < LowerBand) ("reliable", "miscellaneous")
      else (s.status, s.reason) // dead band: hysteresis keeps previous state
    StationState(n, sum, e.counter, s.progress + delta,
      math.max(s.lastSeenNs, e.startNs), status, reason)
  }

  private def update(livenessTimeoutMs: Long, armTimeout: Boolean)(
      station: Long, events: Iterator[StationEvent],
      state: GroupState[StationState]): StationUpdate = {
    if (state.hasTimedOut) {
      // liveness ladder driven by silence duration since the last event
      val s = state.get
      val elapsed = state.getCurrentProcessingTimeMs() - s.lastWallMs
      livenessStatus(elapsed, s.status) match {
        case None =>
          state.remove()
          StationUpdate(station, s.nEvents, s.sumValueCents / 100.0 /
            math.max(s.nEvents, 1), s.progress, "deleted",
            "missed_log_interval", triggered = true)
        case Some(st) =>
          // silence downgrades carry missed_log_interval (reference
          // detectorstation.cpp:115-121); an unchanged status is no trigger
          val changed = st != s.status
          val down = s.copy(status = st,
            reason = if (changed) "missed_log_interval" else s.reason)
          state.update(down)
          if (armTimeout) state.setTimeoutDuration(livenessTimeoutMs)
          StationUpdate(station, down.nEvents, down.sumValueCents / 100.0 /
            math.max(down.nEvents, 1), down.progress, st, down.reason, changed)
      }
    } else {
      val init = state.getOption.getOrElse(
        StationState(0L, 0L, 0L, 0L, 0L, "created"))
      val s = events.toSeq.sortBy(e => (e.startNs, e.counter)).foldLeft(init)(fold)
        .copy(lastWallMs = state.getCurrentProcessingTimeMs())
      state.update(s)
      if (armTimeout) state.setTimeoutDuration(livenessTimeoutMs)
      StationUpdate(station, s.nEvents,
        s.sumValueCents / 100.0 / math.max(s.nEvents, 1), s.progress, s.status,
        s.reason, s.status != init.status)
    }
  }
}
