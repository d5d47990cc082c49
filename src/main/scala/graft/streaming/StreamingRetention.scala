package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One activity observation for the retention tracker (raw-nanos event
  * time). */
case class RetainEvent(userId: Long, tsNs: Long)

/** One retention-counter increment: the user's cohort week saw them
  * active at `weekOffset` for the first time — the row a foreachBatch
  * sink upserts into the dashboard's (cohort, offset) counter store. */
case class RetainInc(cohortWk: Long, weekOffset: Long)

/** Streaming twin of the batch `cohort_retention` matrix: per-user
  * cohort membership tracked live, emitting one increment per NEW
  * (user, active-week) — the increments summed per (cohort, offset)
  * ARE the batch matrix's n_active cells (spec-proven on the real
  * corpus).
  *
  * Bounded state is the design point: two longs per user — the cohort
  * week (first ever seen, immutable) and the newest week already
  * counted. A seen-weeks SET would grow with user lifetime; instead
  * the tracker leans on the watermark contract every event-time
  * pipeline already has: within a micro-batch events fold in
  * event-time order, and an event from a week OLDER than one already
  * counted for that user is only droppable if it would also have been
  * a duplicate of that week or arrived later than the allowed
  * lateness — the same trade `dropDuplicatesWithinWatermark` makes,
  * stated rather than hidden. Gaps are fine in both directions: weeks
  * between lastWk and a newer active week simply never emit (the user
  * was not active), and a week BETWEEN cohortWk and lastWk arriving
  * late within the same micro-batch still emits because the fold
  * sorts first.
  *
  * Week arithmetic is the batch query's: Monday-aligned integer weeks
  * on the raw-nanos axis. */
object StreamingRetention {

  final val NsPerDay = 86400000000000L

  /** (cohort week, newest week already emitted). */
  case class RetainState(cohortWk: Long, lastWk: Long)

  def retentionStream(events: Dataset[RetainEvent])
      : Dataset[RetainInc] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[RetainState, RetainInc](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (_, it, gs: GroupState[RetainState]) =>
          val weeks = it.map(e => (e.tsNs / NsPerDay + 3) / 7)
            .toSeq.distinct.sorted
          if (weeks.isEmpty) Iterator.empty
          else {
            val st0 = gs.getOption.getOrElse(
              RetainState(weeks.head, weeks.head - 1))
            val fresh = weeks.filter(_ > st0.lastWk)
            gs.update(st0.copy(lastWk = math.max(st0.lastWk,
              weeks.last)))
            fresh.iterator.map(w => RetainInc(st0.cohortWk,
              w - st0.cohortWk))
          }
      }
  }
}
