package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Buffer for [[KMinValues]]: the K smallest DISTINCT values seen so
  * far, kept sorted ascending. A case class so the aggregation state
  * rides Spark's product encoder (columnar, no kryo). */
case class KmvBuf(vs: Seq[Long])

/** K-minimum-values aggregation with genuinely BOUNDED state — the
  * 100 TB form of the KMV sketch build: per-group state is a sorted
  * array of at most `k` distinct values, `reduce` is an O(log k)
  * binary-search probe (constant-time reject once the buffer is full
  * and the value exceeds its max — the overwhelmingly common case on a
  * uniform hash stream), and `merge` folds the smaller buffer in, so
  * partial aggregation (map-side combine) applies and no executor ever
  * materializes a group's full distinct set. Replaces the test-scale
  * `slice(array_sort(collect_set(h)), 1, k)` plan shape, which buffers
  * EVERY distinct value per group before truncating — the documented
  * caveat this class retires. Result is identical by construction
  * (same K smallest distinct values), so oracles don't change. */
class KMinValues(k: Int) extends Aggregator[Long, KmvBuf, Seq[Long]] {

  def zero: KmvBuf = KmvBuf(Vector.empty)

  /** Index of the first element ≥ x (binary search on the sorted buf). */
  private def lowerBound(vs: Seq[Long], x: Long): Int = {
    var lo = 0
    var hi = vs.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (vs(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  def reduce(b: KmvBuf, x: Long): KmvBuf = {
    val vs = b.vs
    if (vs.size >= k && x >= vs.last) b // full and not smaller: reject
    else {
      val i = lowerBound(vs, x)
      if (i < vs.size && vs(i) == x) b // already present
      else {
        val nv = (vs.take(i) :+ x) ++ vs.drop(i)
        KmvBuf(if (nv.size > k) nv.take(k) else nv)
      }
    }
  }

  def merge(a: KmvBuf, b: KmvBuf): KmvBuf = b.vs.foldLeft(a)(reduce)

  def finish(r: KmvBuf): Seq[Long] = r.vs

  def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
