package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Jaccard similarity over two SORTED, DISTINCT ARRAY<BIGINT>
  * columns: one merge scan counts the intersection, and
  * jaccard = |∩| / (|A| + |B| − |∩|) — identical to
  * `size(array_intersect(a,b)) / size(array_union(a,b))` on distinct sets
  * (same integers, same double division), but O(n) codegen instead of the
  * interpreted hash-set builtins that dominate the shingle-verify path.
  * Inputs MUST be sorted ascending and duplicate-free (build them with
  * `sort_array(array_distinct(...))` — a once-per-row cost, versus
  * once-per-pair here).
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sorted needs ARRAY<BIGINT>, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    JaccardSorted.jaccard(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardSorted.jaccard($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_sorted"
}

object JaccardSorted {

  /** Merge-scan Jaccard over sorted distinct long arrays. */
  def jaccard(x: ArrayData, y: ArrayData): Double = {
    val nx = x.numElements()
    val ny = y.numElements()
    if (nx == 0 && ny == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val a = x.getLong(i); val b = y.getLong(j)
      if (a == b) { inter += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    inter.toDouble / (nx + ny - inter).toDouble
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaccard_sorted", exprs => JaccardSorted(exprs(0), exprs(1)), "built-in")
}
