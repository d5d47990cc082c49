package graft

import graft.functions.{DotProduct, ParseHitPayload, PolyHash, PolyHashWindows, SimHashSig}
import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension installing the engine's native functions into the
  * Catalyst function registry, so any session built with
  * `.withExtensions(new GraftExtensions)` — or configured with
  * `spark.sql.extensions=graft.GraftExtensions` — can call `poly_hash`
  * and `dot_p` from SQL.
  *
  * No planner strategies or rules are injected: SURVEY.md §4 concluded
  * every reference operator is expressible in the public Dataset API, and
  * the custom work is scalar kernels only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => PolyHash(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("dot_p"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_p"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("poly_hash_windows"),
      new ExpressionInfo(classOf[PolyHashWindows].getName, "poly_hash_windows"),
      (children: Seq[Expression]) =>
        PolyHashWindows(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("parse_hit_payload"),
      new ExpressionInfo(classOf[ParseHitPayload].getName, "parse_hit_payload"),
      (children: Seq[Expression]) => ParseHitPayload(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (children: Seq[Expression]) => {
        // bits must be a literal: it sizes the signature at plan time.
        if (children.length != 2)
          throw new AnalysisException("USER_RAISED_EXCEPTION", Map(
            "errorMessage" ->
              s"simhash_sig(text, bits) takes 2 arguments, got ${children.length}"))
        if (!children(1).foldable)
          throw new AnalysisException("USER_RAISED_EXCEPTION", Map(
            "errorMessage" ->
              "simhash_sig bits argument must be a foldable literal"))
        SimHashSig(children.head,
          children(1).eval().asInstanceOf[Number].intValue())
      }))
  }
}
