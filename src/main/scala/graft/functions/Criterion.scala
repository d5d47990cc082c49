package graft.functions

/** Coincidence criterion kernel.
  *
  * Constants and scoring semantics from the reference:
  *  - pairwise geodesic score: reference src/analysis/coincidence.cpp:14-27,
  *    constants include/analysis/coincidence.h:25-27;
  *  - pairwise simple score: reference src/analysis/simplecoincidence.cpp:12-15;
  *  - cluster score (all-pairs average with valid-edge count): reference
  *    src/analysis/criterion.cpp:7-57, thresholds
  *    include/analysis/criterion.h:49-50.
  */
object Criterion {

  /** Speed of light, meters per nanosecond (times are int64 nanos). */
  final val CMetersPerNano: Double = 0.299792458

  /** Max coincidence search radius, meters (coincidence.h:25). */
  final val MaxDistanceMeters: Double = 62.31836734693877 * 1000.0

  /** Time cut: max |Δstart| considered at all, ns (coincidence.h:26). */
  final val MaxTimeNanos: Double = MaxDistanceMeters / CMetersPerNano

  /** Minimum time-of-flight floor, ns (coincidence.h:27). */
  final val MinTofNanos: Double = 150.0

  /** Cluster-score thresholds (criterion.h:49-50). */
  final val MaxFalse: Double = -0.3
  final val MinTrue: Double = 0.5

  /** Simple-criterion window, ns (simplecoincidence.h:27: 100 µs). */
  final val SimpleWindowNanos: Long = 100000L

  /** Pairwise geodesic score in [-1, 1]: cheap time cut first, then
    * chord-distance time-of-flight. Positive ⇒ the two hits are closer in
    * time than light travel between their stations (allowing MinTof). */
  def scoreGeo(start1: Long, lat1: Double, lon1: Double, h1: Double,
               start2: Long, lat2: Double, lon2: Double, h2: Double): Double = {
    val delta = math.abs(start1 - start2).toDouble
    if (delta > MaxTimeNanos) -1.0
    else {
      val dist = Geo.chordDistance(lat1, lon1, h1, lat2, lon2, h2)
      val tof = math.max(dist / CMetersPerNano, MinTofNanos)
      math.max(1.0 - delta / tof, -1.0)
    }
  }

  /** Pairwise simple score: ±1 on a fixed time window. */
  def scoreSimple(start1: Long, start2: Long): Double =
    if (math.abs(start1 - start2) <= SimpleWindowNanos) 1.0 else -1.0

  sealed trait ScoreType { def ordinal: Int }
  case object Invalid extends ScoreType { val ordinal = 0 }
  case object Conflicting extends ScoreType { val ordinal = 1 }
  case object Valid extends ScoreType { val ordinal = 2 }

  final case class Score(tpe: ScoreType, trueE: Int) {
    def accepted: Boolean = tpe != Invalid
  }

  /** Cluster-vs-cluster score: all-pairs average of the pairwise score over
    * the two hit lists; avg < MaxFalse ⇒ Invalid, avg > MinTrue with every
    * pair valid ⇒ Valid(nValid), else Conflicting(nValid). */
  def clusterScore(pairScore: (Int, Int) => Double, n1: Int, n2: Int): Score = {
    if (n1 == 1 && n2 == 1) {
      return if (pairScore(0, 0) > 0.0) Score(Valid, 1) else Score(Invalid, 0)
    }
    var sum = 0.0
    var valid = 0
    var i = 0
    while (i < n1) {
      var j = 0
      while (j < n2) {
        val v = pairScore(i, j)
        sum += v
        if (v > 0.0) valid += 1
        j += 1
      }
      i += 1
    }
    val avg = sum / (n1.toLong * n2).toDouble
    if (avg < MaxFalse) Score(Invalid, 0)
    else if (avg > MinTrue && valid == n1 * n2) Score(Valid, valid)
    else Score(Conflicting, valid)
  }
}
