package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}

/** One arriving metric reading: centi-unit value, typed. */
case class ValueEvent(eventId: Long, eventType: String, valueC: Long)

/** Both verdicts for one reading, from the frozen per-type thresholds. */
case class OutlierVerdict(eventId: Long, eventType: String, valueC: Long,
                          zFlag: Boolean, madFlag: Boolean)

/** Streaming twin of the batch `value_outliers` query: the ingest-time
  * anomaly gate. The batch query computes per-type statistics AND flags
  * in one plan (the audit pass); a deployed monitor freezes the
  * thresholds — one tiny row per event type: (n, Σv, Σv², 2·median,
  * 4·MAD-ish) — and scores each arriving reading statelessly with the
  * SAME integer comparisons, so stream and batch verdicts agree
  * bit-for-bit on the training window. Pure map in append mode: no
  * state, no watermark, no shuffle; the threshold table rides a
  * broadcast variable. Readings of a type absent from the frozen table
  * pass unflagged (the NB gate's out-of-vocabulary-neutral convention).
  */
object StreamingOutlierGate {

  /** Frozen per-type thresholds, exactly as the batch side computes
    * them. */
  case class TypeThresholds(n: Long, sv: Long, svv: Long,
                            med2: Long, mad4: Long)

  /** Integer verdicts shared with the parity spec: z-test with cleared
    * denominators, MAD test in doubled/quadrupled units. */
  def flags(vc: Long, t: TypeThresholds): (Boolean, Boolean) = {
    val dev = t.n * vc - t.sv
    (dev * dev > 9 * (t.n * t.svv - t.sv * t.sv),
      2 * math.abs(2 * vc - t.med2) > 3 * t.mad4)
  }

  /** Collect the threshold MODEL (one row per event type) for shipment
    * to stream workers — the collect is of the model, not the corpus. */
  def frozen(s: SparkSession, dir: String): Map[String, TypeThresholds] =
    graft.Analytics.outlierThresholds(s, dir).collect().map { r =>
      r.getString(0) -> TypeThresholds(r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
    }.toMap

  def verdicts(events: Dataset[ValueEvent],
               th: Map[String, TypeThresholds]): Dataset[OutlierVerdict] = {
    val spark = events.sparkSession
    import spark.implicits._
    val m = spark.sparkContext.broadcast(th)
    events.map { e =>
      val (zf, mf) = m.value.get(e.eventType) match {
        case Some(t) => flags(e.valueC, t)
        case None    => (false, false)
      }
      OutlierVerdict(e.eventId, e.eventType, e.valueC, zf, mf)
    }
  }
}
