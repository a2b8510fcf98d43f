package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArraySort, Expression, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom optimizer rule (registered via
  * `SparkSessionExtensions.injectOptimizerRule` — the engine's
  * Rule[LogicalPlan] extension surface, mirroring the reference's
  * redundancy-elimination family `RemoveDuplicateConditions.java` /
  * `RemoveRedundantSort` in `sql/planner/iterative/rule/`):
  * collapses provably idempotent collection operations —
  * `array_distinct(array_distinct(x))`, `array_sort(array_sort(x))`,
  * `sort_array(sort_array(x))` (same direction) — which arise
  * naturally when library helpers compose (a dedup helper over an
  * already-deduped pipeline column). Sound for all inputs including
  * nulls: f(f(x)) ≡ f(x) elementwise for these functions.
  */
object IdempotentCollectionOps extends Rule[LogicalPlan] {

  private def collapse(e: Expression): Expression = e match {
    case ArrayDistinct(inner @ ArrayDistinct(_)) => collapse(inner)
    case out @ ArraySort(inner: ArraySort, f1, _)
        if inner.function.semanticEquals(f1) => collapse(inner)
    case out @ SortArray(inner @ SortArray(_, ascInner), ascOuter)
        if ascInner.semanticEquals(ascOuter) => collapse(inner)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case e @ (_: ArrayDistinct | _: ArraySort | _: SortArray) => collapse(e)
    }
}
