package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** One arriving event, pre-bucketed onto the calendar grid. */
case class CellEvent(eventType: String, day: Long, hour: Long)

/** Live status of one (type, day, hour) cell: current count and the
  * frozen-profile verdict. */
case class CellStatus(eventType: String, day: Long, hour: Long,
                      cnt: Long, anomaly: Boolean)

/** Streaming twin of the batch `seasonal_anomaly` query: the live rate
  * monitor. The batch query computes the hour-of-day profile AND flags
  * cells in one plan (the audit pass); a deployed monitor freezes the
  * profile — one row per (type, hour-of-day): (n_cells, Σcnt, Σcnt²) —
  * and scores each cell's RUNNING count with the same cross-multiplied
  * integer z² test, so the stream's final verdicts agree bit-for-bit
  * with batch on the training window.
  *
  * State is one Long per live (type, day, hour) cell — bounded by the
  * calendar grid, not the event volume (types × 24 per day; a
  * production deployment ages out past days with a timeout — the
  * registry liveness-ladder pattern). Cells of an (type, hour) absent
  * from the frozen profile pass unflagged (the out-of-vocabulary-
  * neutral convention shared by the outlier and NB gates).
  */
object StreamingSeasonalGate {

  /** Frozen per-(type, hour-of-day) profile, exactly as the batch side
    * computes it. `ss` (Σcnt²) is a BigInt — the batch profile widens
    * it to DECIMAL(38,0), since counts square past i64 at ~3·10⁹ per
    * cell. */
  case class HourProfile(nCells: Long, tot: Long, ss: BigInt)

  /** Integer verdict shared with the parity spec:
    * (H·cnt − tot)² > 9·(H·ss − tot²) — evaluated in arbitrary
    * precision so the gate matches the batch side's widened DECIMAL
    * arithmetic at any count magnitude (model-sized work: one BigInt
    * product chain per scored cell). */
  def flag(cnt: Long, p: HourProfile): Boolean = {
    val dev = BigInt(p.nCells) * cnt - p.tot
    dev * dev > 9 * (BigInt(p.nCells) * p.ss - BigInt(p.tot) * p.tot)
  }

  /** Collect the profile MODEL (one row per (type, hour)) for shipment
    * to stream workers — the collect is of the model, not the corpus. */
  def frozen(s: SparkSession, dir: String): Map[(String, Long), HourProfile] =
    graft.Analytics.seasonalProfile(s, dir).collect().map { r =>
      (r.getString(0), r.getLong(1)) -> HourProfile(r.getLong(2),
        r.getLong(3), BigInt(r.getDecimal(4).toBigInteger))
    }.toMap

  def statuses(events: Dataset[CellEvent],
               prof: Map[(String, Long), HourProfile])
      : Dataset[CellStatus] = {
    val spark = events.sparkSession
    import spark.implicits._
    val m = spark.sparkContext.broadcast(prof)
    events.groupByKey(e => (e.eventType, e.day, e.hour))
      .mapGroupsWithState[Long, CellStatus](GroupStateTimeout.NoTimeout) {
        (key: (String, Long, Long), it: Iterator[CellEvent],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val (t, d, h) = key
          val c = state.getOption.getOrElse(0L) + it.size
          state.update(c)
          CellStatus(t, d, h, c,
            m.value.get((t, h)).exists(flag(c, _)))
      }
  }
}
