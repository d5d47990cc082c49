package graft.streaming

import org.apache.spark.sql.Dataset

/** Streaming twin of the PCA covariance state
  * ([[graft.Pipeline]]'s `embedding_covariance`): the one-pass
  * (n, Σq, Σq·qᵀ) moments are MERGEABLE BY ADDITION, so a stream
  * maintains them as a running accumulator folded per micro-batch
  * (the quantile-sketch argument run for second-order moments). Each
  * trigger contributes one partial per partition — 2 144 longs — and
  * the covariance read-out is model-sized driver arithmetic identical
  * to the batch query's, so stream == batch exactly at any
  * micro-batching (pinned by the parity spec).
  *
  * 100 TB shape: state is O(d²) integers regardless of stream length;
  * the fold is associative and commutative, so triggers, replays and
  * repartitioning cannot change the result while counts stay inside
  * the documented integer bounds. */
object StreamingMoments {

  final case class Moments(n: Long, sx: Vector[Long], sxy: Vector[Long])

  val empty: Moments =
    Moments(0L, Vector.fill(64)(0L), Vector.fill(2080)(0L))

  /** Fold one partition of milli-quantized vectors. */
  def of(rows: Iterator[Seq[Long]]): Moments = {
    var n = 0L
    val sx = new Array[Long](64)
    val sxy = new Array[Long](2080)
    rows.foreach { qs =>
      val a = qs.toArray
      n += 1
      var i = 0
      var idx = 0
      while (i < 64) {
        sx(i) += a(i)
        var j = i
        while (j < 64) { sxy(idx) += a(i) * a(j); idx += 1; j += 1 }
        i += 1
      }
    }
    Moments(n, sx.toVector, sxy.toVector)
  }

  def merge(a: Moments, b: Moments): Moments = Moments(
    a.n + b.n,
    a.sx.zip(b.sx).map { case (x, y) => x + y },
    a.sxy.zip(b.sxy).map { case (x, y) => x + y })

  private def rndAway(d: Double): Long =
    (if (d >= 0) math.floor(d + 0.5) else math.ceil(d - 0.5)).toLong

  /** The batch query's covariance read-out: (i, j, cov_micro) rows,
    * 1-based dims, upper triangle. */
  def covMicro(m: Moments): Seq[(Long, Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long, Long)]
    var idx = 0
    var i = 0
    while (i < 64) {
      var j = i
      while (j < 64) {
        val num = m.n * m.sxy(idx) - m.sx(i) * m.sx(j)
        out += ((i + 1L, j + 1L,
          rndAway(num.toDouble / (m.n * m.n).toDouble)))
        idx += 1
        j += 1
      }
      i += 1
    }
    out.result()
  }

  /** Per-micro-batch partial: run inside foreachBatch — one Moments
    * per partition, folded to one for the trigger. */
  def batchMoments(quantized: Dataset[Seq[Long]]): Moments = {
    val spark = quantized.sparkSession
    import spark.implicits._
    quantized.mapPartitions(it => Iterator.single(of(it)))
      .collect().foldLeft(empty)(merge)
  }
}
