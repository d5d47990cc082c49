package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One station status trigger (the R8 stream, event-time). */
case class StationTrigger(station: Long, tsNs: Long, status: String)

/** Per-pair uptime state: WHICH of the two stations is currently
  * reliable (relA/relB for the lower/higher station key) + accumulated
  * both-online time. The reference keeps a bare counter
  * (src/analysis/stationcoincidence.cpp:82-108) and relies on trigger
  * discipline; per-station booleans are strictly stronger — a replayed
  * trigger is idempotent, and a downgrade for a station that never
  * upgraded cannot steal the partner's contribution (a counter
  * decrements regardless of WHICH station the trigger names, measured
  * off-by-a-day against the interval truth on the real corpus). */
case class PairUptimeState(relA: Boolean, relB: Boolean,
                           lastOnlineNs: Long, uptimeNs: Long)

/** Per-pair uptime snapshot after a batch of triggers. */
case class PairUptimeOut(stA: Long, stB: Long, online: Int, uptimeMin: Long)

/** A6 streaming form — the trigger→pair-uptime feedback cycle (SURVEY
  * §7.3 item 8) modeled as a second input stream: R8 status triggers fan
  * out to the station's (in-range) pairs, and a per-pair
  * `mapGroupsWithState` drives the reference's online counter — uptime
  * accrues only while it is 2, measured on EVENT time so replays
  * reproduce. The partner list is a broadcast-scale dimension (the same
  * C1-range pruning as the batch `pair_uptime_intervals`). */
object StreamingPairUptime {

  def uptimeStream(triggers: Dataset[StationTrigger],
                   partners: Map[Long, Seq[Long]],
                   timeout: GroupStateTimeout =
                     GroupStateTimeout.NoTimeout): Dataset[PairUptimeOut] = {
    val spark = triggers.sparkSession
    import spark.implicits._
    triggers
      .flatMap { t =>
        partners.getOrElse(t.station, Nil).map { other =>
          (math.min(t.station, other), math.max(t.station, other), t)
        }
      }
      .groupByKey { case (a, b, _) => (a, b) }
      .mapGroupsWithState(timeout)(update)
  }

  /** Fold one trigger into the pair state (reference
    * stationcoincidence.cpp:92-106, upgraded from its counter to
    * per-station booleans): uptime accrues exactly over the spans where
    * BOTH flags hold, seeded on the rising both-edge and banked on the
    * falling one. Idempotent under trigger replay. */
  private[streaming] def fold(key: (Long, Long))(s: PairUptimeState,
                              t: StationTrigger): PairUptimeState = {
    val rel = t.status match {
      case "reliable" => true
      case "unreliable" => false
      case _ => return s // other transitions don't touch the flags
    }
    val was2 = s.relA && s.relB
    val next = if (t.station == key._1) s.copy(relA = rel)
               else if (t.station == key._2) s.copy(relB = rel)
               else return s
    val is2 = next.relA && next.relB
    if (!was2 && is2) next.copy(lastOnlineNs = t.tsNs)
    else if (was2 && !is2)
      next.copy(uptimeNs = s.uptimeNs + (t.tsNs - s.lastOnlineNs))
    else next
  }

  private def update(key: (Long, Long),
                     rows: Iterator[(Long, Long, StationTrigger)],
                     state: GroupState[PairUptimeState]): PairUptimeOut = {
    val init = state.getOption.getOrElse(
      PairUptimeState(relA = false, relB = false, 0L, 0L))
    val s = rows.map(_._3).toSeq.sortBy(t => (t.tsNs, t.station))
      .foldLeft(init)(fold(key))
    state.update(s)
    val online = (if (s.relA) 1 else 0) + (if (s.relB) 1 else 0)
    PairUptimeOut(key._1, key._2, online, s.uptimeNs / 60000000000L)
  }
}
