package graft

import graft.functions.{KMinValues, KmvBuf}
import org.scalatest.funsuite.AnyFunSuite

/** The bounded KMV aggregator against the reference semantics (K
  * smallest distinct values) under random streams, arbitrary splits
  * (merge associativity), duplicates, and the full-buffer reject path. */
class KMinValuesSpec extends AnyFunSuite {

  private val k = 16
  private val agg = new KMinValues(k)

  private def ref(xs: Seq[Long]): Seq[Long] = xs.distinct.sorted.take(k)

  private def viaReduce(xs: Seq[Long]): Seq[Long] =
    agg.finish(xs.foldLeft(agg.zero)(agg.reduce))

  test("reduce matches sort-distinct-take-k on random streams") {
    val rnd = new scala.util.Random(20260813L)
    for (n <- Seq(0, 1, 5, 15, 16, 17, 100, 1000)) {
      val xs = Seq.fill(n)(rnd.nextLong() % 500)
      assert(viaReduce(xs) == ref(xs), s"n=$n")
    }
  }

  test("merge is split-invariant: any partitioning yields the same sketch") {
    val rnd = new scala.util.Random(7L)
    val xs = Seq.fill(400)(rnd.nextLong() % 300)
    val whole = viaReduce(xs)
    for (cut <- Seq(0, 1, 57, 200, 399, 400)) {
      val (l, r) = xs.splitAt(cut)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      assert(merged == whole, s"cut=$cut")
    }
    // three-way association
    val bufs = xs.grouped(140).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    assert(agg.finish(bufs.reduce(agg.merge)) == whole)
    assert(agg.finish(bufs.reverse.reduce(agg.merge)) == whole)
  }

  test("duplicates never inflate the buffer; full-buffer reject is exact") {
    val dup = viaReduce(Seq.fill(50)(7L) ++ Seq.fill(50)(3L))
    assert(dup == Seq(3L, 7L))
    // buffer full of 0..15, larger values rejected, smaller displace max
    val b0 = (0L until 16L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.reduce(b0, 99L).vs == (0L until 16L))
    assert(agg.reduce(b0, -1L).vs == (-1L +: (0L until 15L)))
  }

  test("buffer stays sorted, distinct and bounded at every step") {
    val rnd = new scala.util.Random(99L)
    var b = agg.zero
    for (_ <- 1 to 500) {
      b = agg.reduce(b, rnd.nextLong() % 100)
      assert(b.vs.size <= k && b.vs == b.vs.distinct.sorted)
    }
    assert(b == KmvBuf(b.vs.toVector) || b.vs.nonEmpty)
  }
}
