package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE output size of a string's UTF-8 bytes — the kernel behind
  * the compression-ratio quality signal (repetitive machine-generated
  * text compresses far better than natural prose). Fixed parameters
  * (level 9, default strategy, raw deflate) so the value is a pure
  * function of the input within an environment; rows-only at the
  * driver's gate since no SQL twin exists. Runs per row inside
  * whole-stage codegen; the Deflater is created per call — bounded
  * native state, no pooling hazards under task retries. */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"deflate_len needs STRING, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    DeflateLen.deflatedSize(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateLen.deflatedSize($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)

  override def prettyName: String = "deflate_len"
}

object DeflateLen {

  /** Size of the raw-deflate stream at level 9, default strategy. */
  def deflatedSize(bytes: Array[Byte]): Int = {
    val d = new Deflater(Deflater.BEST_COMPRESSION, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Register `deflate_len` for SQL/selectExpr use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "deflate_len", exprs => DeflateLen(exprs.head), "built-in")
}
