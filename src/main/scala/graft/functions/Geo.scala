package graft.functions

/** WGS84 geodesy + geohash kernel (pure Scala, codegen-friendly via UDF
  * registration in [[Kernel]]).
  *
  * Semantics derive from the reference's call sites
  * (reference: src/analysis/coincidence.cpp:14-27 uses
  * `coordinate::transformation<double, WGS84>::straight_distance`, i.e. the
  * Euclidean chord between geodetic→ECEF points, and
  * include/sink/mqtt.h:169-171 geohash-encodes hit locations truncated to
  * `max_geohash_length`).
  */
object Geo {

  /** WGS84 ellipsoid. */
  final val SemiMajorA: Double = 6378137.0
  final val Flattening: Double = 1.0 / 298.257223563
  final val EccSq: Double = Flattening * (2.0 - Flattening)

  /** Geodetic (degrees, meters) → ECEF (meters). */
  def toEcef(latDeg: Double, lonDeg: Double, h: Double): (Double, Double, Double) = {
    val lat = math.toRadians(latDeg)
    val lon = math.toRadians(lonDeg)
    val sinLat = math.sin(lat)
    val cosLat = math.cos(lat)
    val n = SemiMajorA / math.sqrt(1.0 - EccSq * sinLat * sinLat)
    ((n + h) * cosLat * math.cos(lon),
     (n + h) * cosLat * math.sin(lon),
     (n * (1.0 - EccSq) + h) * sinLat)
  }

  /** Straight-line (chord) distance in meters between two geodetic points —
    * the reference's `straight_distance` (coincidence.cpp:22). */
  def chordDistance(lat1: Double, lon1: Double, h1: Double,
                    lat2: Double, lon2: Double, h2: Double): Double = {
    val (x1, y1, z1) = toEcef(lat1, lon1, h1)
    val (x2, y2, z2) = toEcef(lat2, lon2, h2)
    val dx = x1 - x2; val dy = y1 - y2; val dz = z1 - z2
    math.sqrt(dx * dx + dy * dy + dz * dz)
  }

  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash encoding of (lat, lon) to `len` characters. */
  def geohash(lat: Double, lon: Double, len: Int): String = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    val sb = new StringBuilder(len)
    var isLon = true
    var bit = 0
    var ch = 0
    while (sb.length < len) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else            { ch = ch << 1;       lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else            { ch = ch << 1;       latHi = mid }
      }
      isLon = !isLon
      bit += 1
      if (bit == 5) { sb.append(Base32.charAt(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }
}
