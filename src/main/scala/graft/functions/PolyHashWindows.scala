package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-window form of [[PolyHash]]: every length-k byte window of the
  * input, hashed with the SAME fold — `poly_hash_windows(s, k)[i] ==
  * poly_hash(substring(s, i+1, k))` for ASCII input — in ONE O(len) pass
  * instead of len × O(k) substring folds (h·31 slides in, b·31^(k−1)
  * slides out, both mod P). This is the probe-side kernel of the
  * exact-substring join: stride-1 exactness costs one hash per character,
  * so the constant factor is the whole game at corpus scale.
  *
  * Empty array when the input is shorter than k. Like [[PolyHash]], the
  * window is over UTF-8 BYTES — equal to the char-based substring fold
  * only for ASCII corpora (the only place the equivalence is relied on).
  */
case class PolyHashWindows(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash_windows needs (STRING, INT), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(input: Any, kAny: Any): Any =
    new GenericArrayData(PolyHashWindows.windows(
      input.asInstanceOf[UTF8String].getBytes, kAny.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, k) =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PolyHashWindows.windows($s.getBytes(), $k));
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolyHashWindows =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "poly_hash_windows"
}

object PolyHashWindows {
  final val P = PolyHash.P

  def windows(b: Array[Byte], k: Int): Array[Long] = {
    if (k <= 0 || b.length < k) return Array.emptyLongArray
    // 31^(k-1) mod P — the weight of the byte sliding out of the window
    var pw = 1L
    var e = 0
    while (e < k - 1) { pw = pw * 31L % P; e += 1 }
    val out = new Array[Long](b.length - k + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * 31L + (b(i) & 0xffL)) % P; i += 1 }
    out(0) = h
    while (i < b.length) {
      h = (h - (b(i - k) & 0xffL) * pw % P + P) % P
      h = (h * 31L + (b(i) & 0xffL)) % P
      out(i - k + 1) = h
      i += 1
    }
    out
  }

  /** Register `poly_hash_windows` for SQL/selectExpr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash_windows",
      exprs => PolyHashWindows(exprs.head, exprs(1)), "built-in")
}
