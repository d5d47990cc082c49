package graft

import graft.functions.{Criterion, Geo}
import org.scalatest.funsuite.AnyFunSuite

class KernelSpec extends AnyFunSuite {

  private val eps = 1e-6

  test("ECEF golden values") {
    val (x0, y0, z0) = Geo.toEcef(0, 0, 0)
    assert(math.abs(x0 - 6378137.0) < eps && math.abs(y0) < eps && math.abs(z0) < eps)
    val (x, y, z) = Geo.toEcef(52.5, 13.4, 50)
    assert(math.abs(x - 3785071.1356152915) < 1e-6)
    assert(math.abs(y - 901731.1385945712) < 1e-6)
    assert(math.abs(z - 5036904.252499214) < 1e-6)
  }

  test("chord distance golden values (independent computation)") {
    val near = Geo.chordDistance(52.5, 13.4, 50.0, 52.51, 13.41, 60.0)
    assert(math.abs(near - 1303.6334190794234) < 1e-6)
    val far = Geo.chordDistance(52.5, 13.4, 50.0, 48.1, 11.6, 500.0)
    assert(math.abs(far - 505802.0980540345) < 1e-4)
  }

  test("geohash matches the canonical test vector") {
    assert(Geo.geohash(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(Geo.geohash(57.64911, 10.40744, 6) == "u4pruy")
    assert(Geo.geohash(-25.382708, -49.265506, 8) == "6gkzwgjz")
  }

  test("time cut constant matches reference (207.87 us)") {
    assert(math.abs(Criterion.MaxTimeNanos - 207871.69818307695) < 1e-6)
  }

  test("geodesic score: same place, same time = 1; beyond time cut = -1") {
    assert(Criterion.scoreGeo(1000L, 52.5, 13.4, 50, 1000L, 52.5, 13.4, 50) == 1.0)
    assert(Criterion.scoreGeo(0L, 52.5, 13.4, 50, 300000L, 52.5, 13.4, 50) == -1.0)
  }

  test("geodesic score: tof floor of 150 ns for co-located stations") {
    // 1.3 km apart => tof ~4348 ns; delta 2174 ns => score ~0.5
    val s = Criterion.scoreGeo(0L, 52.5, 13.4, 50, 2174L, 52.51, 13.41, 60)
    assert(math.abs(s - (1.0 - 2174.0 / 4348.453019053013)) < 1e-9)
    // co-located: delta 150 ns at tof floor => score 0
    val s2 = Criterion.scoreGeo(0L, 52.5, 13.4, 50, 150L, 52.5, 13.4, 50)
    assert(math.abs(s2 - 0.0) < 1e-12)
  }

  test("property: score is symmetric and within [-1, 1] (500 seeded cases)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val (la1, lo1, h1) = (rnd.between(-85.0, 85.0), rnd.between(-180.0, 180.0), rnd.between(-100.0, 3000.0))
      val (la2, lo2, h2) = (rnd.between(-85.0, 85.0), rnd.between(-180.0, 180.0), rnd.between(-100.0, 3000.0))
      val t1 = rnd.between(-1000000000L, 1000000000L)
      val t2 = t1 + rnd.between(-500000L, 500000L)
      val a = Criterion.scoreGeo(t1, la1, lo1, h1, t2, la2, lo2, h2)
      val b = Criterion.scoreGeo(t2, la2, lo2, h2, t1, la1, lo1, h1)
      assert(a == b)
      assert(a >= -1.0 && a <= 1.0)
    }
  }

  test("property: simple score window boundary (seeded cases)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val t1 = rnd.between(-1000000000L, 1000000000L)
      val t2 = t1 + rnd.between(-200000L, 200000L)
      val s = Criterion.scoreSimple(t1, t2)
      assert(s == (if (math.abs(t1 - t2) <= 100000L) 1.0 else -1.0))
    }
  }

  test("cluster score: single-single, valid and invalid") {
    val v = Criterion.clusterScore((_, _) => 0.9, 1, 1)
    assert(v == Criterion.Score(Criterion.Valid, 1))
    val i = Criterion.clusterScore((_, _) => -0.1, 1, 1)
    assert(i == Criterion.Score(Criterion.Invalid, 0))
  }

  test("cluster score: all-pairs thresholds") {
    // avg below MaxFalse => invalid
    assert(Criterion.clusterScore((_, _) => -0.5, 2, 2).tpe == Criterion.Invalid)
    // avg > MinTrue and all valid => Valid with count
    val v = Criterion.clusterScore((_, _) => 0.8, 2, 3)
    assert(v == Criterion.Score(Criterion.Valid, 6))
    // mixed: avg between thresholds => Conflicting with valid count
    val scores = Map((0, 0) -> 0.9, (0, 1) -> 0.9, (1, 0) -> -0.9, (1, 1) -> 0.9)
    val c = Criterion.clusterScore((i, j) => scores((i, j)), 2, 2)
    assert(c.tpe == Criterion.Conflicting && c.trueE == 3)
    // avg > MinTrue but not all valid => Conflicting (n==valid gate)
    val scores2 = Map((0, 0) -> 1.0, (0, 1) -> 1.0, (1, 0) -> 1.0, (1, 1) -> -0.2)
    val c2 = Criterion.clusterScore((i, j) => scores2((i, j)), 2, 2)
    assert(c2.tpe == Criterion.Conflicting && c2.trueE == 3)
  }
}
