package graft.operators

/** Z-order (Morton) interleaving — the data-LAYOUT tool for multi-
  * dimensional file skipping at 100 TB. Writing a fact table clustered
  * by `zKey(x, y)` (`repartitionByRange` + `sortWithinPartitions` on the
  * key) makes every file's parquet footer carry TIGHT min/max ranges on
  * BOTH dimensions at once, so point/range predicates on either column
  * prune files — a linear (insertion-order) layout keeps one dimension's
  * span near the full domain in every file and can only skip on the
  * other. `q31_zorder_layout` surfaces exactly the per-bucket stats a
  * writer's footers would hold; ZOrderSpec measures the locality win
  * against the insertion-order layout.
  *
  * The key is pure codegen'd bit arithmetic (shift/and/add, unrolled 16
  * bit positions per dimension) — a map-pass column, no UDF, identical
  * arithmetic in the DuckDB oracle via native `>>`/`&`/`<<`. Inputs are
  * masked to 16 bits (`% 65536`, documented): beyond that domain a
  * production layout raises the bit width, not the algorithm. */
object ZOrder {

  final val Bits = 16

  /** Spark-SQL text of the 32-bit Morton key of (x, y). */
  def zKeySql(x: String, y: String): String =
    (0 until Bits).map { i =>
      s"shiftleft(shiftright($x, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright($y, $i) & 1, ${2 * i + 1})"
    }.mkString(" + ")

  /** The same key in DuckDB SQL (operator spellings). */
  def zKeyDuck(x: String, y: String): String =
    (0 until Bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Plain-Scala reference for the spec. */
  def zKey(x: Long, y: Long): Long =
    (0 until Bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
    }.sum
}
