package graft.streaming

import graft.functions.BloomBits
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** One corpus content-fingerprint observation on the ingest stream. */
case class BloomKey(grp: String, h: Long)

/** Streaming twin of the Bloom bitset build behind `bloom_dedup` (and
  * [[graft.operators.BloomPrune]]): the filter maintained
  * INCREMENTALLY as new corpus shards arrive — the live form of the
  * incremental-dedup story, where tomorrow's batch probes a filter
  * that grew with today's ingest instead of being rebuilt. The batch
  * argument for [[graft.functions.BloomBits]] — fixed m/64-long
  * mergeable state, merge = OR — is exactly what a streaming
  * aggregation needs: run in update mode, the bit array IS the
  * persisted aggregation state, each micro-batch ORs in via the same
  * reduce/merge pair (map-side partials included), and the last
  * update per group is the current filter. Because OR is idempotent,
  * associative and commutative, the streamed bitset is bit-identical
  * to the batch build REGARDLESS of how the corpus is sliced into
  * batches — the property the spec replays adversarially. */
object StreamingBloom {

  /** Running per-group bitsets, one column per geometry in `ms`. Run
    * with `outputMode("update")`. */
  def bitsStream(keys: Dataset[BloomKey], ms: Seq[Int], muls: Seq[Long],
                 p: Long): DataFrame = {
    val aggs = ms.map { m =>
      udaf(new BloomBits(m, muls, p), Encoders.scalaLong)(col("h"))
        .as(s"bits_$m")
    }
    keys.toDF().groupBy("grp").agg(aggs.head, aggs.tail: _*)
  }

  /** The probe predicate shared with the batch query: all k positions
    * of `h` set in `bits`. */
  def isHit(bits: Seq[Long], h: Long, m: Int, muls: Seq[Long],
            p: Long): Boolean =
    muls.forall { mu =>
      val bit = ((h % p + p) % p) * mu % p % m
      (bits((bit / 64).toInt) & (1L << (bit % 64))) != 0
    }
}
