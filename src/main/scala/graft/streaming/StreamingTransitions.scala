package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One event on the analytics stream, with the id tiebreak carried. */
case class TransEvent(userId: Long, eventId: Long, tsNs: Long,
                      eventType: String)

/** One observed transition in a user's event-type chain. */
case class Transition(userId: Long, fromType: String, toType: String)

/** Per-user chain tail: the last event seen, by (tsNs, eventId). */
case class ChainTail(userId: Long, tsNs: Long, eventId: Long,
                     eventType: String)

/** Streaming twin of the batch `event_transitions`: the per-user
  * transition chain tracked live by `flatMapGroupsWithState` keyed on
  * user. State is ONE event — the chain tail — never the event list;
  * each trigger emits the (from → to) pairs the new events complete,
  * including the pair that bridges the previous micro-batch's tail to
  * this batch's first event. The global Markov matrix is then a trivial
  * downstream count over the emitted pairs, which is exactly how the
  * batch query aggregates them.
  *
  * In-order contract: same as the funnel — each user's events must
  * arrive in (event-time, id) order across triggers (within a trigger
  * the fold sorts), or a watermark-delayed sort buffer belongs in
  * front. The parity spec replays the real corpus sliced adversarially
  * across micro-batches and pins the emitted pair multiset equal to the
  * batch matrix. */
object StreamingTransitions {

  def transitionStream(events: Dataset[TransEvent]): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[ChainTail, Transition](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[TransEvent], gs: GroupState[ChainTail]) =>
          val sorted = it.toSeq.sortBy(e => (e.tsNs, e.eventId))
          if (sorted.isEmpty) Iterator.empty
          else {
            val types = sorted.map(_.eventType)
            val bridged = gs.getOption match {
              case Some(t) => t.eventType +: types
              case None    => types
            }
            val last = sorted.last
            gs.update(ChainTail(uid, last.tsNs, last.eventId, last.eventType))
            bridged.sliding(2).collect {
              case Seq(a, b) => Transition(uid, a, b)
            }
          }
      }
  }
}
