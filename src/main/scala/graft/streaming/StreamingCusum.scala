package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One SEALED daily count arriving at the monitor (the upstream
  * watermarked day window emits it once, in day order per type — the
  * StreamingSummary contract). */
case class DayCount(eventType: String, day: Long, x: Long)

/** One live CUSUM chart point. */
case class CusumPoint(eventType: String, day: Long, x: Long,
                      cusumPos: Long, cusumNeg: Long,
                      shiftUp: Boolean, shiftDown: Boolean)

/** Streaming twin of the batch `cusum_shift` chart: the live
  * level-shift monitor. The batch query derives the mean-cleared
  * residual reference (D, T) from the window it analyzes; the deployed
  * monitor FREEZES that reference (one (nd, tot) row per type — the
  * outlier-gate train/score split) and folds each arriving sealed day
  * count through the textbook recursions
  * `S⁺ = max(0, S⁺ + r)` / `S⁻ = max(0, S⁻ − r)` directly — the
  * prefix-extremum closed form the batch side uses is the same
  * arithmetic, so stream and batch chart points agree bit-for-bit on
  * the training window (spec-proven). State per type is three BIGINTs
  * (prefix, running min, running max); emission is one chart point per
  * sealed day. */
object StreamingCusum {

  /** Frozen per-type residual reference. */
  case class CusumRef(nd: Long, tot: Long)

  /** (prefix, min prefix so far incl. 0, max prefix so far incl. 0). */
  case class CusumState(prefix: Long, minP: Long, maxP: Long)

  /** Collect the reference MODEL (one row per type) from the training
    * window — the collect is of the model, not the corpus. */
  def frozen(s: SparkSession, dir: String): Map[String, CusumRef] = {
    val perDay = graft.Tables.events(s, dir)
      .selectExpr("event_type",
        s"ts div ${graft.Analytics.NsPerDay}L AS day")
      .groupBy("event_type", "day").agg(count(lit(1)).as("x"))
    perDay.groupBy("event_type")
      .agg(count(lit(1)).as("nd"), sum("x").as("tot"))
      .collect().map(r =>
        r.getString(0) -> CusumRef(r.getLong(1), r.getLong(2))).toMap
  }

  def chartStream(counts: Dataset[DayCount],
      refs: Map[String, CusumRef],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)
      : Dataset[CusumPoint] = {
    val spark = counts.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(refs)
    counts.groupByKey(_.eventType)
      .flatMapGroupsWithState[CusumState, CusumPoint](
        org.apache.spark.sql.streaming.OutputMode.Append(), timeout) {
        (typ, rows, state: GroupState[CusumState]) =>
          bc.value.get(typ) match {
            case None => Iterator.empty // unknown type: pass (OOV rule)
            case Some(ref) =>
              var st = state.getOption.getOrElse(CusumState(0L, 0L, 0L))
              val out = rows.toSeq.sortBy(_.day).map { dc =>
                val p = st.prefix + (ref.nd * dc.x - ref.tot)
                st = CusumState(p, math.min(st.minP, p),
                  math.max(st.maxP, p))
                val pos = p - st.minP
                val neg = st.maxP - p
                CusumPoint(typ, dc.day, dc.x, pos, neg,
                  pos > 3 * ref.tot, neg > 3 * ref.tot)
              }
              state.update(st)
              out.iterator
          }
      }
  }
}
