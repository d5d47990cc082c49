package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One detector-info field message (S4 wire shape; fieldId 0..5 are the
  * six mandatory location fields tracked by the reference's completeness
  * bitmask, include/source/mqtt.h:98-103). */
case class DetInfoItem(station: Long, startNs: Long, fieldId: Int)

/** Open collector state for one station. */
case class DetInfoState(firstNs: Long, mask: Int, nMsgs: Long)

/** Assembly outcome: `complete` rows carry mask 63; aborted partials are
  * emitted with their partial mask and complete = false. */
case class DetInfoOut(station: Long, firstNs: Long, mask: Int, nMsgs: Long,
                      complete: Boolean)

/** S4 keyed-timeout detector-info assembly (reference
  * include/source/mqtt.h:126-167): a station's item_collector opens at
  * its first field message and must complete the six-bit mandatory mask
  * within 5 seconds of that first message — a field arriving later
  * RESETS the collector (the partial is aborted and the late item opens
  * a fresh collection). Event-time lift: the 5 s window is measured on
  * event time (deterministic under replay, matching the repo's streaming
  * conventions); a ProcessingTimeTimeout additionally wipes stalled
  * partials whose stream simply stopped (pass NoTimeout in synchronous
  * tests, as with StreamingRegistry).
  */
object StreamingDetInfo {

  /** Abort window: 5 s from the collector's first message. */
  final val AbortNs = 5L * 1000000000L
  /** All six mandatory field bits (reference initial status 0x3F). */
  final val FullMask = 63

  def assemblyStream(items: Dataset[DetInfoItem],
                     abortNs: Long = AbortNs,
                     staleTimeoutMs: Long = 10000L,
                     timeout: GroupStateTimeout =
                       GroupStateTimeout.ProcessingTimeTimeout): Dataset[DetInfoOut] = {
    val spark = items.sparkSession
    import spark.implicits._
    val arm = timeout != GroupStateTimeout.NoTimeout
    items
      .groupByKey(_.station)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        update(abortNs, staleTimeoutMs, arm))
  }

  /** Fold one item into the open collector; returns (newState, emitted).
    * Pure — unit-testable without the streaming engine. */
  private[streaming] def fold(st: Option[DetInfoState], e: DetInfoItem,
                              abortNs: Long): (Option[DetInfoState], Option[DetInfoOut]) = {
    val bit = 1 << e.fieldId
    st match {
      case None => (Some(DetInfoState(e.startNs, bit, 1L)), None)
      case Some(s) if e.startNs - s.firstNs > abortNs =>
        // reference mqtt.h:129-131: too late — abort the partial, the
        // late item opens a fresh collection
        (Some(DetInfoState(e.startNs, bit, 1L)),
          Some(DetInfoOut(e.station, s.firstNs, s.mask, s.nMsgs,
            complete = false)))
      case Some(s) =>
        val m = s.mask | bit
        if (m == FullMask)
          (None, Some(DetInfoOut(e.station, s.firstNs, m, s.nMsgs + 1,
            complete = true)))
        else (Some(DetInfoState(s.firstNs, m, s.nMsgs + 1)), None)
    }
  }

  private def update(abortNs: Long, staleTimeoutMs: Long, armTimeout: Boolean)(
      station: Long, items: Iterator[DetInfoItem],
      state: GroupState[DetInfoState]): Iterator[DetInfoOut] = {
    if (state.hasTimedOut) {
      // stream went silent with a partial open: abort it
      val out = state.getOption.map(s =>
        DetInfoOut(station, s.firstNs, s.mask, s.nMsgs, complete = false))
      state.remove()
      out.iterator
    } else {
      var st = state.getOption
      val out = Seq.newBuilder[DetInfoOut]
      for (e <- items.toSeq.sortBy(_.startNs)) {
        val (next, emitted) = fold(st, e, abortNs)
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
