package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite a pure range θ-join into its scalable binned
  * form automatically.
  *
  * An inner join whose only cross-side predicate is `abs(l − r) <= δ`
  * (δ a positive double literal) carries no equi key, so Spark plans
  * BroadcastNestedLoopJoin — O(N·M) row compares, the canonical non-equi
  * scale-killer (see `Joins.binnedRangeJoin`, the hand-written escape).
  * This rule performs that rewrite IN THE OPTIMIZER, so naive user SQL
  * gets the scalable plan without knowing the trick:
  *
  *   J = σ_range(L ⨯ R)   ⇒   ∪_{k∈{-1,0,1}}  L ⋈_{bin(l)+k = bin(r) ∧ range} R
  *
  * with bin(x) = floor(x / δ). Any in-range pair satisfies EXACTLY ONE
  * bin-offset equality (bins are integers), so the union is disjoint —
  * no dedup step — and each branch carries an equi condition Spark hash-
  * partitions on. Correctness therefore needs no verification pass
  * beyond the original predicate, which every branch retains.
  *
  * Guards: inner join; no existing cross-side equality conjunct (then
  * the join is already hashable and the rewrite would only add work);
  * both range sides are DoubleType expressions each bound to one side.
  * Registered via [[GraftExtensions]]' `injectOptimizerRule` or
  * [[RangeJoinRewrite.install]] for sessions built without extensions.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), hint) =>
      val conjuncts = splitConjuncts(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) => crossSide(a, b, l, r)
        case EqualNullSafe(a, b) => crossSide(a, b, l, r)
        case _ => false
      }
      if (hasEqui) j
      else findRange(conjuncts, l, r) match {
        case Some((la, ra, delta)) =>
          val branches = (-1L to 1L).map { k =>
            val lbin = Floor(Divide(la, Literal(delta)))
            val rbin = Floor(Divide(ra, Literal(delta)))
            val eq = EqualTo(Add(lbin, Literal(k)), rbin)
            Join(l, r, Inner, Some(And(cond, eq)), hint)
          }
          Union(branches)
        case None => j
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def crossSide(a: Expression, b: Expression,
      l: LogicalPlan, r: LogicalPlan): Boolean =
    (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
      (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))

  /** First conjunct of shape `abs(x − y) <= δ` with x, y double-typed and
    * bound to opposite sides; returns (left-side expr, right-side expr, δ).
    */
  private def findRange(conjuncts: Seq[Expression],
      l: LogicalPlan, r: LogicalPlan): Option[(Expression, Expression, Double)] =
    conjuncts.collectFirst {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _),
          Literal(d: Double, DoubleType))
        if d > 0 && x.dataType == DoubleType && y.dataType == DoubleType &&
          x.references.subsetOf(l.outputSet) &&
          y.references.subsetOf(r.outputSet) => (x, y, d)
      case LessThanOrEqual(Abs(Subtract(x, y, _), _),
          Literal(d: Double, DoubleType))
        if d > 0 && x.dataType == DoubleType && y.dataType == DoubleType &&
          x.references.subsetOf(r.outputSet) &&
          y.references.subsetOf(l.outputSet) => (y, x, d)
    }

  /** Install into a session built without `withExtensions` (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
