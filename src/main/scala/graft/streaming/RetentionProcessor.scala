package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** The retention tracker on Spark 4's `transformWithState` API — the
  * arbitrary-stateful-processing successor to
  * `flatMapGroupsWithState`, exercised beside the classic form
  * ([[StreamingRetention]]) with IDENTICAL semantics so the spec can
  * pin new-API == old-API == batch on the same replay. The typed
  * `ValueState` handle carries the same two-long state; the processor
  * gains what the old API couldn't express (per-state TTL config,
  * multiple named state variables, timers decoupled from output) —
  * none of which this operator needs, which is exactly the point of
  * the comparison. */
class RetentionProcessor
    extends StatefulProcessor[Long, RetainEvent, RetainInc] {

  @transient private var st: ValueState[StreamingRetention.RetainState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[StreamingRetention.RetainState]("ret",
      Encoders.product[StreamingRetention.RetainState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[RetainEvent],
      timerValues: TimerValues): Iterator[RetainInc] = {
    val weeks = rows
      .map(e => (e.tsNs / StreamingRetention.NsPerDay + 3) / 7)
      .toSeq.distinct.sorted
    if (weeks.isEmpty) Iterator.empty
    else {
      val st0 = Option(st.get()).getOrElse(
        StreamingRetention.RetainState(weeks.head, weeks.head - 1))
      val fresh = weeks.filter(_ > st0.lastWk)
      st.update(st0.copy(lastWk = math.max(st0.lastWk, weeks.last)))
      fresh.iterator.map(w => RetainInc(st0.cohortWk, w - st0.cohortWk))
    }
  }
}

object RetentionProcessor {
  /** The transformWithState form of
    * [[StreamingRetention.retentionStream]]. */
  def retentionStream(events: Dataset[RetainEvent]): Dataset[RetainInc] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new RetentionProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
