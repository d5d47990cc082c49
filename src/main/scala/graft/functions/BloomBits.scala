package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Buffer for [[BloomBits]]: a fixed-width bitset as packed longs. */
case class BloomBuf(bits: Seq[Long])

/** Bloom-bitset aggregation — the build side of a manual runtime join
  * filter ([[graft.operators.BloomPrune]]). State is EXACTLY m/64
  * longs at every stage (map-side partials included), `reduce` sets the
  * k per-key bits, `merge` is a bitwise OR — associative and
  * commutative, so the result is partition-order independent and the
  * filter is deterministic: the same public mixing primes on both the
  * build and probe side make membership a pure function of the key. */
class BloomBits(mBits: Int, muls: Seq[Long], p: Long)
    extends Aggregator[Long, BloomBuf, Seq[Long]] {

  private val words = mBits / 64

  def zero: BloomBuf = BloomBuf(Vector.fill(words)(0L))

  def reduce(b: BloomBuf, key: Long): BloomBuf = {
    var vs = b.bits
    muls.foreach { m =>
      val bit = ((key % p + p) % p) * m % p % mBits
      val w = (bit / 64).toInt
      vs = vs.updated(w, vs(w) | (1L << (bit % 64)))
    }
    BloomBuf(vs)
  }

  def merge(a: BloomBuf, b: BloomBuf): BloomBuf =
    BloomBuf(a.bits.zip(b.bits).map { case (x, y) => x | y })

  def finish(r: BloomBuf): Seq[Long] = r.bits

  def bufferEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
