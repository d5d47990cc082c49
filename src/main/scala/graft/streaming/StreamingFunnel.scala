package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One event on the product-analytics stream. */
case class FunnelEvent(userId: Long, typ: String, us: Long)

/** Per-user funnel progress: earliest time of each completed stage
  * (view → click → purchase, each strictly after the previous). */
case class FunnelState(userId: Long, t1: Option[Long], t2: Option[Long],
                       t3: Option[Long]) {
  def stage: Int = if (t3.isDefined) 3 else if (t2.isDefined) 2
    else if (t1.isDefined) 1 else 0
}

/** Streaming twin of the batch `q25_funnel`: per-user funnel progress
  * tracked live by `mapGroupsWithState` keyed on user — the state is
  * three optional timestamps, exactly the batch claim ("per-user state
  * is one timestamp per stage, never the event list") executed as a
  * stream. Each trigger emits the users whose stage advanced; the
  * funnel readout (stage counts) is a trivial aggregate over the
  * latest state per user.
  *
  * In-order contract: the chained "strictly after" semantics make a
  * one-pass fold order-sensitive, so the stream must deliver each
  * user's events in event-time order (the file-replay and MQTT-bridge
  * sources here do; out-of-order ingest would need a watermark-delayed
  * sort buffer in front — the standard streaming-funnel caveat, stated
  * rather than hidden). The parity spec replays the real corpus sorted,
  * sliced adversarially ACROSS micro-batches, and pins stream state ==
  * the batch stage tables. */
object StreamingFunnel {

  /** Fold one event into the per-user stage timestamps. */
  def advance(st: FunnelState, e: FunnelEvent): FunnelState = e.typ match {
    case "view" if st.t1.isEmpty => st.copy(t1 = Some(e.us))
    case "click" if st.t2.isEmpty &&
      st.t1.exists(e.us > _) => st.copy(t2 = Some(e.us))
    case "purchase" if st.t3.isEmpty &&
      st.t2.exists(e.us > _) => st.copy(t3 = Some(e.us))
    case _ => st
  }

  def funnelStream(events: Dataset[FunnelEvent]): Dataset[FunnelState] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.userId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[FunnelEvent], gs: GroupState[FunnelState]) =>
          val st0 = gs.getOption.getOrElse(FunnelState(uid, None, None, None))
          // within one micro-batch the iterator is unordered: sort by
          // event time (ties by type rank: a view at t gates a click
          // only if STRICTLY earlier, so rank order is immaterial for
          // correctness but makes the fold deterministic)
          val st = it.toSeq.sortBy(e => (e.us, e.typ))
            .foldLeft(st0)(advance)
          gs.update(st)
          st
      }
  }
}
