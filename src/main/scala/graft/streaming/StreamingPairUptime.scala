package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One station status trigger (the R8 stream, event-time). */
case class StationTrigger(station: Long, tsNs: Long, status: String)

/** Per-pair uptime state: the reference's `online` counter (how many of
  * the two stations are currently reliable) + accumulated both-online
  * time (reference src/analysis/stationcoincidence.cpp:82-108). */
case class PairUptimeState(online: Int, lastOnlineNs: Long, uptimeNs: Long)

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
    * stationcoincidence.cpp:92-106; the reference's size_t counter relies
    * on trigger discipline — we clamp at 0 so a duplicate downgrade
    * cannot wrap, and at 2 so a replayed upgrade cannot overshoot (an
    * online=3 state would absorb one later downgrade and silently corrupt
    * all subsequent uptime accrual). lastOnlineNs is (re)seeded only on
    * the real 1→2 edge. */
  private[streaming] def fold(s: PairUptimeState,
                              t: StationTrigger): PairUptimeState =
    t.status match {
      case "unreliable" =>
        val up =
          if (s.online == 2) s.uptimeNs + (t.tsNs - s.lastOnlineNs)
          else s.uptimeNs
        s.copy(online = math.max(0, s.online - 1), uptimeNs = up)
      case "reliable" =>
        val last = if (s.online == 1) t.tsNs else s.lastOnlineNs
        s.copy(online = math.min(2, s.online + 1), lastOnlineNs = last)
      case _ => s // other transitions don't touch the counter
    }

  private def update(key: (Long, Long),
                     rows: Iterator[(Long, Long, StationTrigger)],
                     state: GroupState[PairUptimeState]): PairUptimeOut = {
    val init = state.getOption.getOrElse(PairUptimeState(0, 0L, 0L))
    val s = rows.map(_._3).toSeq.sortBy(t => (t.tsNs, t.station))
      .foldLeft(init)(fold)
    state.update(s)
    PairUptimeOut(key._1, key._2, s.online, s.uptimeNs / 60000000000L)
  }
}
