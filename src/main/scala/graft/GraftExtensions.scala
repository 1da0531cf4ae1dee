package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.{RewriteVectorDot, VectorDot, VectorEqCount}

/** Session-extension entry point: register graft's custom Catalyst
  * expressions through the supported `SparkSessionExtensions` hook, so a
  * cluster user gets them in plain SQL with
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT vector_dot(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * This is the config-driven twin of
  * [[graft.plans.VectorExpressions.register]] (which installs into an
  * already-built session's temp-function registry).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vector_eq_count"),
      new ExpressionInfo(classOf[VectorEqCount].getName, "vector_eq_count"),
      (exprs: Seq[Expression]) => VectorEqCount(exprs(0), exprs(1))))
    // auto-vectorize the interpreted HOF dot-product pattern
    ext.injectOptimizerRule(_ => RewriteVectorDot)
  }
}
