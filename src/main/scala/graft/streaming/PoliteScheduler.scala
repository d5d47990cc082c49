package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One fetch request on the crawl stream. */
case class FetchRequest(docId: Long, hostKey: String, tMs: Long)

/** Scheduled fetch: the politeness-delayed slot. */
case class ScheduledFetch(docId: Long, hostKey: String, tMs: Long,
    schedMs: Long, delayMs: Long)

/** Streaming per-host politeness scheduler — the standing-query twin
  * of the batch `polite_schedule`: state is ONE `lastSchedMs` per live
  * host, each request schedules at `max(t, last + D)`, requests settle
  * in (tMs, docId) order inside a micro-batch, so a desired-time-
  * ordered replay reproduces the batch closed-form schedule exactly
  * (pinned by the parity spec). The politeness key IS the parallelism
  * key: hosts shard across executors, no host waits on another. */
object PoliteScheduler {

  def schedule(reqs: Dataset[FetchRequest], delayMs: Long)
      : Dataset[ScheduledFetch] = {
    val spark = reqs.sparkSession
    import spark.implicits._
    reqs.groupByKey(_.hostKey)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout)(process(delayMs))
  }

  private def process(delayMs: Long)(host: String,
      rows: Iterator[FetchRequest], state: GroupState[Long])
      : Iterator[ScheduledFetch] = {
    var last = state.getOption.getOrElse(Long.MinValue)
    val out = rows.toSeq.sortBy(r => (r.tMs, r.docId)).map { r =>
      val sched =
        if (last == Long.MinValue) r.tMs
        else math.max(r.tMs, last + delayMs)
      last = sched
      ScheduledFetch(r.docId, host, r.tMs, sched, sched - r.tMs)
    }
    state.update(last)
    out.iterator
  }
}
