package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[VectorDot]] — the pattern users naturally write in
  * SQL, which otherwise evaluates its lambdas interpreted per element
  * outside whole-stage codegen (~20x slower on an all-pairs cosine scan).
  *
  * The rewrite emits `VectorDot(l, r, strict = true)`, whose codegen
  * reproduces the HOF's exact null/length semantics (any null element or
  * a length mismatch yields NULL), so the rule is unconditionally sound —
  * no nullability or equal-length assumption. It fires only for
  * `array<double>` inputs: on float arrays the HOF multiplies in float
  * then accumulates, while VectorDot widens each element to double first,
  * which can differ in the last ulp. Opt out with
  * `spark.graft.rewriteVectorDot=false`.
  *
  * Registered by [[graft.GraftExtensions]] through
  * `injectOptimizerRule` — the (c)-level extension path (plan rule via
  * SparkSessionExtensions), complementing the (b)-level custom expression.
  */
object RewriteVectorDot extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.rewriteVectorDot", "true")
      .toBoolean

  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isSymmetric(l: Expression, r: Expression,
                          a: NamedLambdaVariable,
                          b: NamedLambdaVariable): Boolean =
    (l.semanticEquals(a) && r.semanticEquals(b)) ||
      (l.semanticEquals(b) && r.semanticEquals(a))

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(l, r, LambdaFunction(Multiply(mx, my, _),
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(ax, ay, _),
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
          if doubleArray(l) && doubleArray(r) &&
            isSymmetric(mx, my, x, y) && isSymmetric(ax, ay, acc, el) &&
            fin.semanticEquals(fv) =>
        VectorDot(l, r, strict = true)
    }
}
