package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native SimHash signature over an array of element hashes: one pass
  * maintaining all bit counters (counter[b] += (h>>b)&1 ? 1 : −1; bit b
  * set iff counter[b] > 0), versus `bits` interpreted aggregate passes
  * over the array. Identical integer arithmetic to the portable
  * higher-order-function form, so the DuckDB oracles are unchanged.
  * Width is a construction-time constant (16 for the signature query,
  * 30 — the poly-hash entropy bound — for banded near-dup).
  */
case class SimHashSig(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig needs ARRAY<BIGINT>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHashSig.fold(arr, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashSig.fold($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)

  override def prettyName: String = "simhash_sig"
}

object SimHashSig {

  /** Shared by interpreted eval and generated code. Null elements vote
    * like 0 (all bits clear ⇒ −1 per bit), matching the portable form's
    * lambda over a containsNull array. */
  def fold(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val counts = new Array[Long](bits)
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      var b = 0
      while (b < bits) {
        counts(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_sig", exprs => SimHashSig(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
}
