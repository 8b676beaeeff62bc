package graft.plans

import graft.expressions.DotProduct
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the natural higher-order-function spelling of
  * a vector dot product into the codegen'd [[DotProduct]] expression.
  *
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)`
  * is how a user writes a dot product with builtins — and it evaluates
  * INTERPRETED: higher-order array functions are CodegenFallback, so
  * every row pays a boxed product array plus per-element lambda evals
  * (the measured lesson behind [[DotProduct]] and the SymSpell
  * neighborhood rewrite). This rule gives naive user SQL the codegen
  * expression, the same contract as [[RangeJoinRewrite]]: know the
  * scalable form ONCE, in the optimizer, instead of in every query.
  *
  * The rewrite preserves bit-exact results for ALIGNED, NULL-FREE
  * vector columns: both sides fold double products in ascending index
  * order (float multiply commutes bitwise, so operand order within the
  * lambda doesn't matter). It is NOT an identity on dirty data — a null
  * element or a length mismatch makes the HOF form return NULL (null
  * product poisons the fold; zip_with pads the shorter array), while
  * [[DotProduct]] folds over min(len) and assumes non-null elements.
  * Parquet schemas can't prove either precondition (list elements stay
  * nullable in the footer even when no null exists), so the rule only
  * fires when the session states the contract explicitly:
  *
  *   spark.conf.set("spark.graft.rewrite.dotProduct", "true")
  *
  * — the embeddings-table guarantee every other consumer of the column
  * (cosine, MIPS, IVF, PQ) already relies on. Default off: an installed
  * rule must not silently change NULL semantics for corpora that never
  * opted in.
  *
  * Match shape (after analysis, so lambda variables are resolved):
  * argument = zip_with over two float/double arrays whose lambda is a
  * double-typed multiply of the two lambda variables (modulo Cast to
  * double); zero = 0.0 literal; merge = acc + v over exactly the two
  * merge variables; finish = identity.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  val enableKey = "spark.graft.rewrite.dotProduct"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(enableKey, "false") != "true") plan
    else plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(mul @ Multiply(mx, my, _), Seq(
              x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0d, DoubleType),
          LambdaFunction(Add(al, ar, _), Seq(
            acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(
            facc: NamedLambdaVariable), _))
        if mul.dataType == DoubleType &&
          varPair(mx, my, x, y) && varPair(al, ar, acc, v) &&
          fin.exprId == facc.exprId &&
          vectorTyped(a) && vectorTyped(b) =>
        DotProduct(a, b)
    }

  /** `(l, r)` are the two given lambda variables in either order, each
    * possibly wrapped in a Cast to double (which is exactly the
    * float→double widening [[DotProduct]] performs per element).
    */
  private def varPair(l: Expression, r: Expression,
      p: NamedLambdaVariable, q: NamedLambdaVariable): Boolean = {
    def strip(e: Expression): Option[ExprId] = e match {
      case nv: NamedLambdaVariable => Some(nv.exprId)
      case Cast(nv: NamedLambdaVariable, DoubleType, _, _) => Some(nv.exprId)
      case _ => None
    }
    (strip(l), strip(r)) match {
      case (Some(i), Some(j)) =>
        (i == p.exprId && j == q.exprId) || (i == q.exprId && j == p.exprId)
      case _ => false
    }
  }

  private def vectorTyped(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Install into a session built without `withExtensions` (idempotent);
    * firing still requires the [[enableKey]] conf.
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
