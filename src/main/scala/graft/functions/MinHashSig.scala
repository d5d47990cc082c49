package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 16-permutation MinHash signature over a set of element hashes:
  * sig[k] = min over h of ((2k+3)·h + 99991k + 7) mod P — one pass over
  * the input maintaining all 16 minima, versus 16 interpreted
  * transform+array_min passes (each allocating an intermediate array).
  * Identical integer arithmetic to the portable form, so the DuckDB
  * oracle is unchanged.
  */
case class MinHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // A signature over an empty set is meaningless (the all-MaxValue vector
  // would silently diverge from the oracle's NULL list_min) — return null.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash16 needs ARRAY<BIGINT>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(MinHashSig.K)(Long.MaxValue)
    var i = 0
    var seen = false
    while (i < n) {
      if (!arr.isNullAt(i)) { // skip null elements, don't read them as 0
        seen = true
        val h = arr.getLong(i)
        var k = 0
        while (k < MinHashSig.K) {
          val v = ((2L * k + 3) * h + k * 99991L + 7) % MinHashSig.P
          if (v < sig(k)) sig(k) = v
          k += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash16"
}

object MinHashSig {
  final val K = 16
  final val P = 1000000007L

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash16", exprs => MinHashSig(exprs.head), "built-in")
}
