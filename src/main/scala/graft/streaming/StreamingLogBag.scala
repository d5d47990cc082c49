package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One detector-log item message (S5 wire shape). */
case class LogItem(station: Long, startNs: Long, name: String, value: String)

/** Open bag for one station: first-item time + accumulated items. */
case class LogBagState(firstNs: Long, names: List[String],
                       values: List[String])

/** One committed bag, items presented sorted for deterministic compare. */
case class LogBagOut(station: Long, firstNs: Long, nItems: Long,
                     itemsStr: String)

/** S5 streaming detector-log bag assembly (reference
  * include/source/mqtt.h:251-257 + buffer loop :396-432): a station's
  * collector accumulates ALL items; an item arriving more than 5 s after
  * the bag's FIRST item triggers `Commit = Finished | NewEpoch` — unlike
  * S4's abort, the bag is EMITTED and the triggering item seeds the next
  * epoch's collector. Event-time lift of the 5 s window, with a
  * processing-time timeout committing (not discarding) bags on streams
  * that simply stop. */
object StreamingLogBag {

  /** Commit window: 5 s from the bag's first item. */
  final val CommitNs = 5L * 1000000000L

  def bagStream(items: Dataset[LogItem],
                commitNs: Long = CommitNs,
                staleTimeoutMs: Long = 10000L,
                timeout: GroupStateTimeout =
                  GroupStateTimeout.ProcessingTimeTimeout): Dataset[LogBagOut] = {
    val spark = items.sparkSession
    import spark.implicits._
    val arm = timeout != GroupStateTimeout.NoTimeout
    items
      .groupByKey(_.station)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        update(commitNs, staleTimeoutMs, arm))
  }

  private[streaming] def commit(station: Long, s: LogBagState): LogBagOut =
    LogBagOut(station, s.firstNs, s.names.size.toLong,
      s.names.zip(s.values).map { case (n, v) => s"$n=$v" }
        .sorted.mkString(";"))

  /** Fold one item; returns (newState, emittedBag). Pure. */
  private[streaming] def fold(st: Option[LogBagState], e: LogItem,
                              commitNs: Long): (Option[LogBagState], Option[LogBagOut]) =
    st match {
      case None =>
        (Some(LogBagState(e.startNs, List(e.name), List(e.value))), None)
      case Some(s) if e.startNs - s.firstNs > commitNs =>
        // reference mqtt.h:255-257: Commit — emit the bag, the late item
        // seeds the next epoch (NewEpoch re-entry in the buffer loop)
        (Some(LogBagState(e.startNs, List(e.name), List(e.value))),
          Some(commit(e.station, s)))
      case Some(s) =>
        (Some(LogBagState(s.firstNs, e.name :: s.names,
          e.value :: s.values)), None)
    }

  private def update(commitNs: Long, staleTimeoutMs: Long, armTimeout: Boolean)(
      station: Long, items: Iterator[LogItem],
      state: GroupState[LogBagState]): Iterator[LogBagOut] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(s => commit(station, s))
      state.remove()
      out.iterator
    } else {
      var st = state.getOption
      val out = Seq.newBuilder[LogBagOut]
      for (e <- items.toSeq.sortBy(i => (i.startNs, i.name))) {
        val (next, emitted) = fold(st, e, commitNs)
        st = next
        emitted.foreach(out += _)
      }
      st match {
        case Some(s) =>
          state.update(s)
          if (armTimeout) state.setTimeoutDuration(staleTimeoutMs)
        case None => if (state.exists) state.remove()
      }
      out.result().iterator
    }
  }
}
